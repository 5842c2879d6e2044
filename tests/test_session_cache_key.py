"""r9 verdict #6: memoized per-session state must key on the Spark
applicationId, never id(spark) — CPython reuses the id() of a
garbage-collected session, so a later session in the same process
could inherit cached state bound to a stopped JVM."""

from __future__ import annotations

from iceberg_evaluation_spark.plans._tmpdirs import session_cache_key


class _FakeCtx:
    def __init__(self, app_id):
        self.applicationId = app_id


class _FakeSession:
    def __init__(self, app_id):
        self.sparkContext = _FakeCtx(app_id)


def test_two_sequential_sessions_get_distinct_keys():
    """The id()-reuse scenario: the first session object dies, the
    second is allocated at the SAME memory address — the keys must
    still differ because the applicationId does."""
    a = _FakeSession("local-1000")
    key_a = session_cache_key(a, "/sf0.01")
    addr_a = id(a)
    del a
    # force an allocation at (possibly) the same address; identity of
    # the address doesn't matter — the assertion is that the key never
    # depends on it
    b = _FakeSession("local-2000")
    key_b = session_cache_key(b, "/sf0.01")
    assert key_a != key_b
    assert key_a == ("local-1000", "/sf0.01")
    assert key_b == ("local-2000", "/sf0.01")
    assert addr_a is not None  # addr equality is incidental either way


def test_same_session_same_key():
    s = _FakeSession("local-3000")
    assert session_cache_key(s, "x") == session_cache_key(s, "x")
    assert session_cache_key(s, "x") != session_cache_key(s, "y")


def test_live_registry_uses_no_id_spark_keys():
    """Regression grep: no plan module may key a cache on id(spark)."""
    import glob
    import os

    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "iceberg_evaluation_spark",
    )
    offenders = []
    for path in glob.glob(os.path.join(root, "**", "*.py"), recursive=True):
        with open(path) as f:
            src = f.read()
        if "(id(spark)" in src or "(id(df.sparkSession)" in src:
            offenders.append(path)
    assert not offenders, offenders
