import gc
import os
import sys
import time

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from polycheck_spark.session import get_spark
    s = get_spark("polycheck_spark_tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


def _persisted_rdd_ids(spark):
    it = spark.sparkContext._jsc.getPersistentRDDs().keySet().iterator()
    out = set()
    while it.hasNext():
        out.add(it.next())
    return out


@pytest.fixture(autouse=True)
def assert_no_persisted_rdd_leak(request):
    """Suite-wide storage-leak guard (generalizes r4's
    test_tile_rollup_leaves_nothing_persisted): after every test, no NEW
    RDD may remain persisted once test-local references are released.

    Operator-internal ``.cache()`` entries live in the CacheManager until
    session end and therefore FAIL here deterministically — the r4 review
    finding this guards against.  ``localCheckpoint`` storage (the pattern
    the operators use) is ContextCleaner-reclaimed once the frames are
    garbage-collected, so the check first drops Python references
    (gc.collect → py4j detach), prompts a JVM GC, and polls briefly; only
    storage still pinned after that is a leak.  Tests that legitimately
    keep data hot must use localCheckpoint (reclaimed here) or a
    module-scoped fixture materialized at setup (lands in ``before``)."""
    if "spark" not in request.fixturenames:
        yield
        return
    spark = request.getfixturevalue("spark")
    before = _persisted_rdd_ids(spark)
    yield
    if spark.streams.active:
        # a still-running streaming query holds state asynchronously; its
        # own test is responsible for stopping it — don't race the check
        return
    leaked = _persisted_rdd_ids(spark) - before
    deadline = time.time() + 25
    while leaked and time.time() < deadline:
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.4)
        leaked = _persisted_rdd_ids(spark) - before
    assert not leaked, (
        f"test left RDDs persisted (ids {sorted(leaked)}): operator-internal "
        f".cache()/.persist() with no unpersist path — use a lazy "
        f"localCheckpoint instead (ContextCleaner-reclaimed)")


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
