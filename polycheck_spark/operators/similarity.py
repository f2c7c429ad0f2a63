"""Similarity search over embedding columns (array<float>).

Two paths:
* :func:`cosine_topk` — brute-force exact top-k. The dot product and norms are
  higher-order Column functions (``zip_with`` + ``aggregate``) — JVM-side, no
  Python. Queries are broadcast; the big side streams.  This is the baseline
  and the verifier for the approximate path.
* :func:`lsh_bucket_topk` — random-hyperplane LSH: deterministic pseudo-planes
  hashed from (plane, dim), sign-bit bucket key, candidates restricted to
  same-bucket (+ optional 1-bit-flip probing), exact rescoring inside buckets.
  At scale the bucket join replaces the full cross product.

Outputs carry (query_id, target_id, rank) — ranks are float-order-robust
because embedding cosines are generic reals; both engines order by
(cosine DESC, target_id ASC).
"""

from __future__ import annotations

from functools import lru_cache as _lru_cache

from pyspark.sql import DataFrame, Window, functions as F

N_PLANES = 8


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm2(a):
    return F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)


def _cosine(a, b):
    """Guarded cosine: a zero-norm vector scores 0.0 against everything
    (cosine is undefined there; under ANSI mode the raw division raises
    DIVIDE_BY_ZERO).  CaseWhen evaluates the division branch lazily, so the
    guard costs nothing on the normal path and the value is unchanged for
    every non-zero vector — oracle hashes are unaffected."""
    n2 = _norm2(a) * _norm2(b)
    return F.when(n2 > 0, _dot(a, b) / F.sqrt(n2)).otherwise(F.lit(0.0))


def cosine_topk(embeddings: DataFrame, queries: DataFrame, k: int, *,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k of each query against all embeddings.

    ``queries`` is small and broadcast; excludes self-matches.
    """
    t = embeddings.select(F.col(id_col).alias("target_id"),
                          F.col(vec_col).cast("array<double>").alias("tvec"))
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).cast("array<double>").alias("qvec"))
    cand = t.join(F.broadcast(q), F.col("target_id") != F.col("query_id"))
    cos = _cosine(F.col("qvec"), F.col("tvec"))
    scored = cand.select("query_id", "target_id", cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("target_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "target_id", "rank"))


def _cos_sql(a: str, b: str) -> str:
    """Engine-parity cosine in DuckDB SQL (single source for every twin);
    same zero-norm guard as :func:`_cosine`."""
    n2 = (f"(list_sum(list_transform({a}, x -> x * x))"
          f" * list_sum(list_transform({b}, x -> x * x)))")
    dot = f"list_sum(list_transform(range(len({a})), i -> {a}[i + 1] * {b}[i + 1]))"
    return f"(CASE WHEN {n2} > 0 THEN {dot} / sqrt({n2}) ELSE 0.0 END)"


def np_guarded_cosine(a, b):
    """Row-wise guarded cosine of two (N, dim) float64 arrays — the NumPy
    twin of :func:`_cosine` (zero-norm pairs score 0.0).  One einsum per
    term; each row's value depends only on its own elements, so the result
    is batching/partitioning-invariant.  Shared by the banded rescore and
    the near-dup job so the vectorized threshold semantics exist once."""
    import numpy as np
    dot = np.einsum("ij,ij->i", a, b)
    n2 = np.einsum("ij,ij->i", a, a) * np.einsum("ij,ij->i", b, b)
    return np.divide(dot, np.sqrt(n2), out=np.zeros_like(dot), where=n2 > 0)


def _empty_ranked(df: DataFrame) -> DataFrame:
    """Empty (query_id, target_id, rank) frame — what every top-k path
    returns for an empty query set.  The Column paths get this for free
    (broadcast join against zero rows); the Arrow paths collect the queries
    driver-side first and must synthesize it so the fast twin stays a
    drop-in replacement on the empty-filter edge case."""
    from pyspark.sql import types as T
    schema = T.StructType([
        T.StructField("query_id", T.LongType()),
        T.StructField("target_id", T.LongType()),
        T.StructField("rank", T.IntegerType(), False),
    ])
    return df.sparkSession.createDataFrame([], schema)


def cosine_topk_sql(table: str, queries_filter: str, k: int,
                    id_col: str = "vec_id", vec_col: str = "embedding") -> str:
    """DuckDB twin using explicit per-element sums (same math as zip_with)."""
    return f"""
WITH t AS (SELECT {id_col} AS target_id,
                  list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS tvec FROM {table}),
q AS (SELECT {id_col} AS query_id,
             list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS qvec
      FROM {table} WHERE {queries_filter}),
scored AS (
  SELECT q.query_id, t.target_id, {_cos_sql("qvec", "tvec")} AS cosine
  FROM t JOIN q ON t.target_id <> q.query_id
),
ranked AS (
  SELECT query_id, target_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, target_id ASC) AS rank
  FROM scored
)
SELECT query_id, target_id, CAST(rank AS BIGINT) AS rank FROM ranked WHERE rank <= {k}
"""


IVF_CENTROID_BUDGET = 64   # coarse-quantizer size target — FIXED, not O(N)
IVF_NPROBE = 4


def _centroid_modulus(n_vectors: int, n_centroids: int) -> int:
    """Deterministic centroid selector: ids with ``id % m == 0`` where
    ``m = max(1, N // budget)``.  Centroid count is ~budget (bounded by
    2*budget for N >= budget) — independent of data size, unlike a fixed
    modulus whose centroid count grows linearly with N."""
    return max(1, n_vectors // max(1, n_centroids))


def _assign_lists(vecs: DataFrame, cents: DataFrame, id_col: str,
                  vec_col: str, keep: int) -> DataFrame:
    """Nearest-centroid assignment by cosine (ties -> lowest centroid id):
    cross join against the broadcast centroid table, keep the top lists.

    ``keep == 1`` (the TARGET side — all N vectors) is an argmax, computed
    as ``groupBy(max(struct(ccos, -cid, vec)))``: a hash aggregate with
    map-side partial combine, so only N pre-combined rows shuffle instead
    of the window path's full N x n_centroids sort-shuffle — the dominant
    IVF cost at scale.  Same semantics as rank 1 (max cosine, tie -> min
    cid; cid is unique so the trailing struct fields never decide).
    ``keep > 1`` (the QUERY side — small) keeps the window top-k."""
    cos = _cosine(F.col(vec_col), F.col("cvec"))
    scored = vecs.crossJoin(F.broadcast(cents)).withColumn("ccos", cos)
    if keep == 1:
        best = F.max(F.struct(F.col("ccos"),
                              (-F.col("cid")).alias("negcid"),
                              F.col(vec_col).alias("v"))).alias("m")
        return (scored.groupBy(id_col).agg(best)
                .select(id_col, F.col("m.v").alias(vec_col),
                        (-F.col("m.negcid")).alias("list_id")))
    w = Window.partitionBy(id_col).orderBy(F.col("ccos").desc(), F.col("cid").asc())
    return (scored
            .withColumn("crank", F.row_number().over(w))
            .filter(F.col("crank") <= keep)
            .select(id_col, vec_col, F.col("cid").alias("list_id")))


def ivf_train_kmeans(embeddings: DataFrame, *,
                     n_centroids: int = IVF_CENTROID_BUDGET,
                     iters: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     n_vectors: int | None = None) -> DataFrame:
    """Spherical k-means coarse quantizer for IVF — the trained alternative
    to the modulus-subset centroids.

    Initialization is the SAME deterministic modulus subset the untrained
    path uses (re-keyed 0..C-1 in id order), followed by a FIXED number of
    Lloyd rounds: one distributed pass per round computes per-partition
    (centroid, sum-of-assigned-normalized-vectors, count) partials via a
    BLAS argmax per Arrow batch (ties -> lowest centroid index, matching
    :func:`_assign_lists`); the driver reduces the C x dim partials (a few
    KB — never O(N) driver state) and renormalizes.  An empty cluster keeps
    its previous centroid.  No RNG anywhere; given a partitioning the run
    is reproducible, and across partitionings centroids differ only by
    float-sum reassociation ulps — irrelevant to recall, which is the
    quantity training buys (the untrained subset stays the oracle-exact
    default; trained centroids are approximate-by-nature, covered by the
    recall pytest rather than a SQL twin).

    Returns a (cid, cvec) DataFrame accepted by :func:`ivf_topk` /
    :func:`ivf_topk_arrow` via their ``centroids`` parameter.  At 10^12
    vectors each round is one scan + one C x dim reduce — the textbook
    distributed k-means shape; sample the training input
    (e.g. :func:`polycheck_spark.operators.sampling.sample_hash`) to train
    on a subset when even one scan per round is too much.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    n = n_vectors if n_vectors is not None else embeddings.count()
    mod = _centroid_modulus(n, n_centroids)
    crows = (embeddings.filter(F.col(id_col) % mod == 0)
             .select(F.col(id_col), F.col(vec_col).cast("array<double>"))
             .orderBy(F.col(id_col)).collect())
    if not crows:
        raise ValueError("ivf_train_kmeans: empty init centroid set")
    cmat = np.array([r[1] for r in crows], dtype=np.float64)
    cn = np.linalg.norm(cmat, axis=1, keepdims=True)
    cmat = np.divide(cmat, np.where(cn > 0, cn, 1.0))
    c, dim = cmat.shape

    schema = T.StructType([
        T.StructField("cid", T.LongType()),
        T.StructField("vsum", T.ArrayType(T.DoubleType())),
        T.StructField("cnt", T.LongType()),
    ])

    src = embeddings.select(F.col(vec_col).cast("array<double>").alias("__vec"))
    for _ in range(iters):
        cm = cmat  # bind the round's matrix (closure over the loop var)

        def partials(batches, cm=cm):
            sums = np.zeros((c, dim))
            cnt = np.zeros(c, dtype=np.int64)
            for pdf in batches:
                v = np.array(list(pdf["__vec"]), dtype=np.float64)
                vn = np.linalg.norm(v, axis=1, keepdims=True)
                v = np.divide(v, np.where(vn > 0, vn, 1.0))
                best = np.argmax(v @ cm.T, axis=1)   # first max = lowest cid
                np.add.at(sums, best, v)
                np.add.at(cnt, best, 1)
            live = np.flatnonzero(cnt)
            yield pd.DataFrame({"cid": live.astype(np.int64),
                                "vsum": [sums[i] for i in live],
                                "cnt": cnt[live]})

        rows = src.mapInPandas(partials, schema).collect()
        sums = np.zeros((c, dim))
        cnt = np.zeros(c, dtype=np.int64)
        for r in rows:
            sums[r["cid"]] += np.asarray(r["vsum"])
            cnt[r["cid"]] += r["cnt"]
        live = cnt > 0
        means = np.divide(sums, cnt[:, None], out=np.zeros_like(sums),
                          where=live[:, None])
        mn = np.linalg.norm(means, axis=1, keepdims=True)
        means = np.divide(means, np.where(mn > 0, mn, 1.0))
        cmat = np.where((live & (mn[:, 0] > 0))[:, None], means, cmat)

    spark = embeddings.sparkSession
    out = [(int(i), [float(x) for x in cmat[i]]) for i in range(c)]
    return spark.createDataFrame(out, "cid long, cvec array<double>")


def ivf_topk(embeddings: DataFrame, queries: DataFrame, k: int, *,
             id_col: str = "vec_id", vec_col: str = "embedding",
             n_probe: int = IVF_NPROBE,
             n_centroids: int = IVF_CENTROID_BUDGET,
             n_vectors: int | None = None,
             centroids: DataFrame | None = None) -> DataFrame:
    """IVF-flat approximate cosine top-k — the inverted-list alternative to
    :func:`lsh_bucket_topk`.

    Coarse quantizer: a deterministic centroid subset of ~``n_centroids``
    vectors (ids divisible by ``max(1, N // n_centroids)``) — the centroid
    count is a FIXED budget, never O(N), so the centroid table stays
    broadcast-able at any data size.  Pass ``n_vectors`` (a known/estimated
    count — table stats, snapshot manifest) to skip the ``count()`` scan;
    on parquet that count is footer-metadata-only anyway.  When verifying
    against :func:`ivf_topk_sql`, pass the SAME ``n_vectors`` to the
    emitter (its default recomputes ``COUNT(*)`` — correct only if the
    Spark side counted exactly): any estimate that changes
    ``N // n_centroids`` would silently select a different centroid set.  At 10^12 vectors
    set ``n_centroids ~ sqrt(N)`` (the classical IVF balance: assignment
    N*sqrt(N) dot products, probe lists of ~sqrt(N)); the default fixed 64
    is sized for the test corpora.

    Every vector joins its single nearest list, every query probes its
    ``n_probe`` nearest lists; candidates are rescored exactly and ranked.
    The candidate join is an equi-join on list_id — never an all-pairs
    product.  All arithmetic is double (bit-identical across engines), so
    the whole path is oracle-checkable (:func:`ivf_topk_sql`).

    ``centroids``: an optional (cid, cvec) DataFrame overriding the
    modulus subset — pass :func:`ivf_train_kmeans` output for trained
    coarse quantization (higher recall on clustered corpora; the trained
    path trades the SQL oracle for a recall pytest).
    """
    if centroids is not None:
        cents = centroids.select(F.col("cid"),
                                 F.col("cvec").cast("array<double>").alias("cvec"))
    else:
        n = n_vectors if n_vectors is not None else embeddings.count()
        mod = _centroid_modulus(n, n_centroids)
        cents = embeddings.filter(F.col(id_col) % mod == 0).select(
            F.col(id_col).alias("cid"),
            F.col(vec_col).cast("array<double>").alias("cvec"))
    t = embeddings.select(F.col(id_col).alias("target_id"),
                          F.col(vec_col).cast("array<double>").alias("tvec"))
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).cast("array<double>").alias("qvec"))
    t_assigned = _assign_lists(t, cents, "target_id", "tvec", 1)
    q_probed = _assign_lists(q, cents, "query_id", "qvec", n_probe)
    cand = (t_assigned.join(F.broadcast(q_probed), "list_id")
            .filter(F.col("target_id") != F.col("query_id")))
    cos = _cosine(F.col("qvec"), F.col("tvec"))
    # no distinct: a target sits in exactly ONE list and a query's probed
    # list_ids are pairwise distinct (row_number ranks), so each
    # (query, target) pair joins at most once — deduping again would cost a
    # full shuffle for nothing (invariant pinned by
    # test_ann_outputs_have_no_duplicate_pairs)
    scored = cand.select("query_id", "target_id", cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("target_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "target_id", "rank"))


def ivf_topk_sql(table: str, queries_filter: str, k: int,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 n_probe: int = IVF_NPROBE,
                 n_centroids: int = IVF_CENTROID_BUDGET,
                 n_vectors: int | None = None) -> str:
    """DuckDB twin of :func:`ivf_topk` (same centroids, same assignment).

    The centroid modulus comes from ``n_vectors`` when given — pass the SAME
    value the Spark side was called with, so an estimated count still selects
    identical centroids on both engines.  With ``n_vectors=None`` the modulus
    is computed in SQL from ``COUNT(*)``, matching a Spark side that counted
    exactly (the default).  Mixing an estimate on one side with an exact
    count on the other would silently pick different centroid sets."""
    def assign(src: str, idc: str, vc: str, keep) -> str:
        return f"""
  SELECT {idc}, {vc}, cid AS list_id FROM (
    SELECT s.{idc}, s.{vc}, c.cid,
           ROW_NUMBER() OVER (PARTITION BY s.{idc}
                              ORDER BY {_cos_sql(f's.{vc}', 'c.cvec')} DESC,
                                       c.cid ASC) AS crank
    FROM {src} s CROSS JOIN cents c
  ) WHERE crank <= {keep}"""
    if n_vectors is not None:
        cmod = f"SELECT {_centroid_modulus(n_vectors, n_centroids)} AS m"
    else:
        cmod = f"SELECT GREATEST(1, COUNT(*) // {max(1, n_centroids)}) AS m FROM {table}"
    return f"""
WITH cmod AS ({cmod}),
cents AS (SELECT {id_col} AS cid,
                 list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS cvec
          FROM {table} WHERE {id_col} % (SELECT m FROM cmod) = 0),
t AS (SELECT {id_col} AS target_id,
             list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS tvec FROM {table}),
q AS (SELECT {id_col} AS query_id,
             list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS qvec
      FROM {table} WHERE {queries_filter}),
ta AS ({assign('t', 'target_id', 'tvec', 1)}),
qa AS ({assign('q', 'query_id', 'qvec', n_probe)}),
scored AS (
  SELECT query_id, target_id, {_cos_sql('qvec', 'tvec')} AS cosine
  FROM ta JOIN qa USING (list_id)
  WHERE target_id <> query_id
),
ranked AS (
  SELECT query_id, target_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, target_id ASC) AS rank
  FROM scored
)
SELECT query_id, target_id, CAST(rank AS BIGINT) AS rank FROM ranked WHERE rank <= {k}
"""


def _plane_component(plane: int, dim_idx):
    """Deterministic pseudo-hyperplane component in [-1, 1): first 8 md5 hex
    digits of 'plane:dim' — md5 is the one hash both engines compute
    identically (same scheme as text._tok_int), so the whole LSH path is
    oracle-expressible (see :func:`lsh_bucket_topk_sql`)."""
    h = F.conv(F.substring(
        F.md5(F.concat(F.lit(f"{plane}:"), dim_idx.cast("string"))), 1, 8),
        16, 10).cast("long")
    return (F.pmod(h, F.lit(2_000_003)) - F.lit(1_000_001.5)) / F.lit(1_000_001.5)


@_lru_cache(maxsize=None)
def _plane_weights(dim: int, n_planes: int = N_PLANES) -> tuple[tuple[float, ...], ...]:
    """The n_planes x dim hyperplane weight matrix, computed ONCE driver-side.

    Same derivation as :func:`_plane_component` (md5 -> int -> affine), same
    IEEE-double arithmetic — the two are bit-identical (pinned by
    tests/test_text_ops.py), so buckets and oracle hashes are unchanged.
    The weight depends only on (plane, dim index); evaluating it inside the
    per-row ``transform`` lambda re-ran 8 x dim md5+conv calls per ROW
    (Catalyst cannot hoist an expression of the lambda variable) — the
    constant factor on the hot path of every LSH query."""
    import hashlib
    rows = []
    for p in range(n_planes):
        row = []
        for i in range(dim):
            h = int(hashlib.md5(f"{p}:{i}".encode()).hexdigest()[:8], 16)
            row.append((h % 2_000_003 - 1_000_001.5) / 1_000_001.5)
        rows.append(tuple(row))
    return tuple(rows)


def _infer_dim(df: DataFrame, vec_col: str) -> int:
    """Embedding width from one row (a single-row scan — negligible at any
    scale; pass ``dim`` explicitly when the schema registry knows it)."""
    row = df.select(F.size(F.col(vec_col)).alias("d")).first()
    return int(row["d"]) if row is not None else 0


def bucket_key_col(vec_col, dim: int | None = None,
                   n_planes: int = N_PLANES):
    """Sign-bit LSH bucket id from ``n_planes`` pseudo-random hyperplanes.

    With ``dim`` the plane weights are precomputed literal arrays (JVM-side
    constant, zero per-row hashing).  ``dim=None`` falls back to deriving the
    weights per element — only for callers that truly cannot know the width
    (ragged vectors would bucket by prefix either way: zip_with nulls out
    length mismatches, so fixed-width input is assumed regardless).

    ``n_planes`` defaults to the oracle-pinned 8 (256 buckets — what every
    driver-checked query uses); scale paths size it with the corpus —
    ~log2(N / target_bucket_population) — so bucket population, and with it
    the quadratic per-bucket candidate cost, stays CONSTANT as N grows
    (fixed-plane LSH degrades quadratically instead; see
    jobs/near_dup_job.py)."""
    key = F.lit(0).cast("long")
    for p in range(n_planes):
        if dim is not None:
            wcol = F.array(*[F.lit(w) for w in _plane_weights(dim, n_planes)[p]])
        else:
            wcol = F.transform(F.sequence(F.lit(0), F.size(vec_col) - 1),
                               lambda i: _plane_component(p, i))
        proj = F.aggregate(
            F.zip_with(vec_col, wcol, lambda x, w: x * w),
            F.lit(0.0), lambda acc, v: acc + v)
        key = key.bitwiseOR(F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0)).cast("long"))
    return key


def lsh_bucket_topk(embeddings: DataFrame, queries: DataFrame, k: int, *,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    multiprobe: bool = True, dim: int | None = None) -> DataFrame:
    """Approximate cosine top-k: candidates share an LSH bucket (or differ by
    one sign bit when multiprobe), rescored exactly, ranked per query.
    ``dim`` (inferred from one row when omitted) switches the bucketer to
    precomputed literal plane weights — no per-row md5."""
    if dim is None:
        dim = _infer_dim(embeddings, vec_col)
    t = embeddings.select(F.col(id_col).alias("target_id"),
                          F.col(vec_col).cast("array<double>").alias("tvec"))
    t = t.withColumn("bucket", bucket_key_col(F.col("tvec"), dim))
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).cast("array<double>").alias("qvec"))
    q = q.withColumn("qbucket", bucket_key_col(F.col("qvec"), dim))
    if multiprobe:
        probes = F.array(F.col("qbucket"),
                         *[F.col("qbucket").bitwiseXOR(F.lit(1 << p)) for p in range(N_PLANES)])
        q = q.withColumn("bucket", F.explode(probes))
    else:
        q = q.withColumn("bucket", F.col("qbucket"))
    cand = t.join(F.broadcast(q.drop("qbucket")), "bucket") \
            .filter(F.col("target_id") != F.col("query_id"))
    cos = _cosine(F.col("qvec"), F.col("tvec"))
    # no distinct: a target has ONE bucket and the multiprobe keys of a
    # query (qbucket + 8 one-bit flips) are pairwise distinct, so each
    # (query, target) pair joins at most once (see ivf_topk note)
    scored = cand.select("query_id", "target_id", cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("target_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "target_id", "rank"))


def near_dup_pairs(embeddings: DataFrame, threshold: tuple[int, int] = (19, 20), *,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   mode: str = "lsh", dim: int | None = None,
                   max_bucket_freq: int | None = None,
                   impl: str = "column",
                   n_planes: int = N_PLANES) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (a, b) with a < b and
    cosine(a, b) >= num/den.

    mode 'lsh' (the 100-TB path): candidates restricted to shared LSH buckets
    (multiprobe, same md5 hyperplanes as :func:`lsh_bucket_topk`), exact
    cosine rescore inside buckets — never an all-pairs product.  mode
    'exact': brute-force all-pairs (the small-scale verifier; recall 1).
    The threshold is rational (num, den) cross-multiplied so there is no
    float-literal boundary drift between engines.

    ``max_bucket_freq``: hot-bucket cap for scale.  A bucket holding S
    vectors yields ~S^2 candidate rows in the self-join, so one degenerate
    bucket (e.g. millions of near-zero or boilerplate embeddings hashing
    alike) melts the join at 100x data.  With the cap, buckets whose
    exact-key population exceeds it are dropped from candidate generation
    entirely — strictly conservative (capped output is a subset of
    uncapped).  None disables the cap (exact LSH semantics; what the
    driver oracle checks).

    ``n_planes``: LSH plane count — pass the same count to
    :func:`near_dup_pairs_sql` when verifying (its plane derivation is
    width-parameterized too); size it ~log2(N / target_bucket_population)
    at corpus scale so per-bucket candidate cost stays constant (see
    :func:`bucket_key_col` and jobs/near_dup_job.py; scale settings are
    additionally recall-pinned by the stress harness).
    """
    num, den = threshold
    if dim is None and mode == "lsh":
        dim = _infer_dim(embeddings, vec_col)
    t = embeddings.select(F.col(id_col).alias("a"),
                          F.col(vec_col).cast("array<double>").alias("avec"))
    u = embeddings.select(F.col(id_col).alias("b"),
                          F.col(vec_col).cast("array<double>").alias("bvec"))
    if mode == "lsh":
        # the candidate join carries IDS ONLY — vectors rejoin by id after,
        # so the wide arrays never ride the bucket shuffle.  No dedup
        # needed: a vector has ONE exact bucket and the multiprobe keys of
        # the other side are pairwise distinct, so each (a, b) pair joins
        # at most once (invariant pinned by
        # test_ann_outputs_have_no_duplicate_pairs).
        # impl='arrow' swaps the interpreted fold-lambda bucketer for the
        # BLAS batch matmul (:func:`_buckets_arrow`) — same buckets unless
        # a projection ties zero within ulps.  Both join sides derive from
        # ONE bucketing pass: the (id, bucket) frame is eagerly
        # localCheckpoint-ed (ids-only — 16 B/row, bounded at any scale),
        # so the embeddings — the dominant scan — are read once for
        # bucketing instead of once per side; the two self-join branches
        # then scan the checkpointed RDD, not the source.  The checkpoint
        # is LAZY (materializes at the caller's first action, so building
        # the plan / .explain() stays free) and its ids-only storage is
        # released by the ContextCleaner when the result DataFrame is
        # garbage-collected — per-call storage is bounded and reclaimed,
        # not leaked for the session's lifetime.
        if impl == "arrow":
            bk = _buckets_arrow(embeddings.select(F.col(id_col).alias("vid"),
                                                  F.col(vec_col).alias("v")),
                                "vid", "v", dim,
                                n_planes=n_planes).localCheckpoint(eager=False)
            tb = bk.select(F.col("vid").alias("a"), "bucket")
            ub0 = bk.select(F.col("vid").alias("b"),
                            F.col("bucket").alias("qbucket"))
        else:
            tb = t.select("a", bucket_key_col(F.col("avec"), dim, n_planes).alias("bucket"))
            ub0 = u.select("b", bucket_key_col(F.col("bvec"), dim, n_planes).alias("qbucket"))
        if max_bucket_freq is not None:
            cool = (tb.groupBy("bucket").agg(F.count(F.lit(1)).alias("bf"))
                    .filter(F.col("bf") <= max_bucket_freq).select("bucket"))
            tb = tb.join(cool, "bucket", "left_semi")
        probes = F.array(F.col("qbucket"),
                         *[F.col("qbucket").bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)])
        ub = ub0.withColumn("bucket", F.explode(probes)).drop("qbucket")
        if max_bucket_freq is not None:
            ub = ub.join(cool, "bucket", "left_semi")
        cand_ids = (tb.join(ub, "bucket").filter(F.col("a") < F.col("b"))
                    .select("a", "b"))
        cand = cand_ids.join(t, "a").join(u, "b")
    elif mode == "exact":
        cand = t.join(u, F.col("a") < F.col("b"))
    else:
        raise ValueError("mode must be 'lsh' or 'exact'")
    if impl == "arrow" and mode == "lsh":
        # vectorized rescore with an exact boundary band — output identical
        # to the HOF filter (see _rescore_banded), ~10x less rescore CPU on
        # the candidate set, which dominates this operator's wall time
        return _rescore_banded(cand, num, den)
    cos = _cosine(F.col("avec"), F.col("bvec"))
    return (cand.withColumn("cosine", cos)
            .filter(F.col("cosine") * den >= F.lit(num))
            .select("a", "b"))


def _rescore_banded(cand: DataFrame, num: int, den: int) -> DataFrame:
    """Threshold rescore of (a, b, avec, bvec) candidate pairs: one BLAS
    einsum per Arrow batch decides every pair whose margin from the
    threshold exceeds BAND; the (empirically empty) boundary band is
    re-evaluated with the EXACT sequential fold the Column/SQL paths use —
    so the accepted set is bit-identical to the interpreted HOF filter, at
    vectorized speed.  The band is 1e-9 in COSINE units, scaled by ``den``
    to margin units (margin = cos*den - num, so BLAS-vs-fold cosine
    divergence is amplified by den): 1e-9 is ~10^4 x the worst-case
    pairwise-vs-sequential summation divergence for dim <= 10^4
    (~dim * eps), so a BLAS-vs-fold decision flip can only occur INSIDE
    the band, where the fold decides — for any rational threshold."""
    import math
    import numpy as np

    BAND = 1e-9 * den

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            a = np.array(list(pdf["avec"]), dtype=np.float64)
            b = np.array(list(pdf["bvec"]), dtype=np.float64)
            margin = np_guarded_cosine(a, b) * den - num
            accept = margin >= BAND
            for i in np.flatnonzero(np.abs(margin) < BAND):
                # exact left fold, identical op order to F.aggregate/DuckDB
                av, bv = pdf["avec"].iloc[i], pdf["bvec"].iloc[i]
                s = 0.0
                for x, y in zip(av, bv):
                    s += x * y
                na = 0.0
                for x in av:
                    na += x * x
                nb = 0.0
                for y in bv:
                    nb += y * y
                n2e = na * nb
                ce = s / math.sqrt(n2e) if n2e > 0 else 0.0
                accept[i] = ce * den >= num
            yield pdf.loc[accept, ["a", "b"]]

    return cand.select("a", "b", "avec", "bvec").mapInPandas(run, "a long, b long")


def near_dup_pairs_sql(table: str, threshold: tuple[int, int] = (19, 20),
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       mode: str = "lsh",
                       max_bucket_freq: int | None = None,
                       n_planes: int = N_PLANES) -> str:
    """DuckDB twin of :func:`near_dup_pairs` (same buckets, same rescore).
    ``max_bucket_freq`` mirrors the Spark hot-bucket cap: buckets whose
    exact-key population exceeds it are excluded from pairing (filtering the
    exact side alone is output-equivalent to filtering both — probe rows
    only match buckets present on the exact side).  ``n_planes`` mirrors
    :func:`near_dup_pairs`'s plane count (the md5 plane derivation is
    width-parameterized, so any count matches the Spark side)."""
    num, den = threshold
    cos = _cos_sql("avec", "bvec")
    if mode == "lsh":
        probes = ", ".join(["qbucket"] + [f"xor(qbucket, {1 << p})" for p in range(n_planes)])
        tb_cap = ""
        if max_bucket_freq is not None:
            tb_cap = f"\n        QUALIFY COUNT(*) OVER (PARTITION BY bucket) <= {max_bucket_freq}"
        cand = f"""
t AS (SELECT {id_col} AS a, list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS avec
      FROM {table}),
tb AS (SELECT a, avec, {_bucket_sql('avec', n_planes)}::BIGINT AS bucket FROM t{tb_cap}),
u AS (SELECT {id_col} AS b, list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS bvec
      FROM {table}),
qb AS (SELECT b, bvec, {_bucket_sql('bvec', n_planes)}::BIGINT AS qbucket FROM u),
ub AS (SELECT b, bvec, unnest([{probes}]) AS bucket FROM qb),
cand AS (SELECT a, b, avec, bvec
         FROM tb JOIN ub USING (bucket) WHERE a < b)"""
    else:
        cand = f"""
cand AS (
  SELECT x.{id_col} AS a, y.{id_col} AS b,
         list_transform(x.{vec_col}, v -> CAST(v AS DOUBLE)) AS avec,
         list_transform(y.{vec_col}, v -> CAST(v AS DOUBLE)) AS bvec
  FROM {table} x JOIN {table} y ON x.{id_col} < y.{id_col})"""
    return f"""
WITH {cand}
SELECT a, b FROM cand WHERE ({cos}) * {den} >= {num}
"""


def _plane_component_sql(plane: int, dim_expr: str) -> str:
    return (f"(CAST('0x' || substr(md5('{plane}:' || CAST({dim_expr} AS VARCHAR)), 1, 8) "
            f"AS BIGINT) % 2000003 - 1000001.5e0) / 1000001.5e0")


def _bucket_sql(vec: str, n_planes: int = N_PLANES) -> str:
    bits = []
    for p in range(n_planes):
        proj = (f"list_sum(list_transform(range(len({vec})), "
                f"i -> {vec}[i + 1] * ({_plane_component_sql(p, 'i')})))")
        bits.append(f"CASE WHEN {proj} > 0 THEN {1 << p} ELSE 0 END")
    return "(" + " + ".join(bits) + ")"


def lsh_bucket_topk_sql(table: str, queries_filter: str, k: int,
                        id_col: str = "vec_id", vec_col: str = "embedding") -> str:
    """DuckDB twin of :func:`lsh_bucket_topk` (multiprobe on): identical md5
    plane weights, sign-bit buckets, 1-bit probes, exact rescore + rank."""
    probes = ", ".join(["qbucket"] + [f"xor(qbucket, {1 << p})" for p in range(N_PLANES)])
    return f"""
WITH t AS (SELECT {id_col} AS target_id,
                  list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS tvec FROM {table}),
tb AS (SELECT target_id, tvec, {_bucket_sql('tvec')}::BIGINT AS bucket FROM t),
q AS (SELECT {id_col} AS query_id,
             list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS qvec
      FROM {table} WHERE {queries_filter}),
qb AS (SELECT query_id, qvec, {_bucket_sql('qvec')}::BIGINT AS qbucket FROM q),
probes AS (SELECT query_id, qvec, unnest([{probes}]) AS bucket FROM qb),
scored AS (
  SELECT query_id, target_id, {_cos_sql("qvec", "tvec")} AS cosine
  FROM tb JOIN probes USING (bucket)
  WHERE target_id <> query_id
),
ranked AS (
  SELECT query_id, target_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, target_id ASC) AS rank
  FROM scored
)
SELECT query_id, target_id, CAST(rank AS BIGINT) AS rank FROM ranked WHERE rank <= {k}
"""


# --- int8 two-stage re-rank ANN ----------------------------------------------

QUANT_TOPM = 50


def _quant_scale(vec_col):
    """Per-vector quantizer scale 127/max|x| (0 for the zero vector)."""
    mx = F.array_max(F.transform(vec_col, lambda x: F.abs(x)))
    return F.when(mx > 0, F.lit(127.0) / mx).otherwise(F.lit(0.0))


def quantized_topk(embeddings: DataFrame, queries: DataFrame, k: int, *,
                   m: int = QUANT_TOPM,
                   id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Two-stage int8 re-rank ANN — the storage/shuffle-bound scale pattern.

    Stage 1 scores int8-quantized vectors (per-vector scale 127/max|x|,
    floor-quantized — floor, not round: identical in every engine) with an
    INTEGER dot product and keeps the top ``m`` per query; stage 2 rescores
    only those ``m`` survivors with the exact double cosine and ranks top
    ``k``.  At 10^12 vectors the quantized copy is what ships through the
    scan/shuffle — 8x fewer bytes than float64 (1 B/dim) — and the float
    vectors are fetched by id for just m rows/query.  Integer arithmetic is
    bit-identical across engines, so the survivor SET (ties broken by id)
    and therefore the final ranking are oracle-exact
    (:func:`quantized_topk_sql`).
    """
    t = embeddings.select(F.col(id_col).alias("target_id"),
                          F.col(vec_col).cast("array<double>").alias("tvec"))
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).cast("array<double>").alias("qvec"))

    def quant(vec):
        # the scale rides an array_repeat ARGUMENT, not the lambda body: an
        # expression referenced inside a HOF lambda is re-evaluated per
        # element (the r2 shingling trap — array_max alone is O(dim), so
        # inlining it would make quantization O(dim^2) per row); as a repeat
        # argument it is evaluated once per row no matter what
        # CollapseProject inlines
        return F.zip_with(vec, F.array_repeat(_quant_scale(vec), F.size(vec)),
                          lambda x, s: F.floor(x * s).cast("int"))

    tq = t.select("target_id", quant(F.col("tvec")).alias("tq"))
    qq = q.select("query_id", quant(F.col("qvec")).alias("qq"))
    idot = F.aggregate(F.zip_with(F.col("qq"), F.col("tq"),
                                  lambda x, y: (x * y).cast("long")),
                       F.lit(0).cast("long"), lambda acc, v: acc + v)
    w1 = Window.partitionBy("query_id").orderBy(F.col("idot").desc(),
                                                F.col("target_id").asc())
    survivors = (tq.join(F.broadcast(qq), F.col("target_id") != F.col("query_id"))
                 .select("query_id", "target_id", idot.alias("idot"))
                 .withColumn("mrank", F.row_number().over(w1))
                 .filter(F.col("mrank") <= m)
                 .select("query_id", "target_id"))
    cand = survivors.join(t, "target_id").join(
        q.withColumnRenamed("query_id", "qid2"),
        F.col("query_id") == F.col("qid2")).drop("qid2")
    cos = _cosine(F.col("qvec"), F.col("tvec"))
    w2 = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                                F.col("target_id").asc())
    return (cand.select("query_id", "target_id", cos.alias("cosine"))
            .withColumn("rank", F.row_number().over(w2))
            .filter(F.col("rank") <= k)
            .select("query_id", "target_id", "rank"))


def quantized_topk_sql(table: str, queries_filter: str, k: int,
                       m: int = QUANT_TOPM,
                       id_col: str = "vec_id", vec_col: str = "embedding") -> str:
    """DuckDB twin of :func:`quantized_topk` (same quantizer, same integer
    stage-1 scores, same tie-breaks)."""
    def quant(vec):
        mx = f"list_max(list_transform({vec}, x -> abs(x)))"
        scale = f"(CASE WHEN {mx} > 0 THEN CAST(127 AS DOUBLE) / {mx} ELSE 0.0 END)"
        return f"list_transform({vec}, x -> CAST(FLOOR(x * {scale}) AS INT))"
    idot = ("CAST(list_sum(list_transform(range(len(qq)), "
            "i -> CAST(qq[i + 1] AS BIGINT) * tq[i + 1])) AS BIGINT)")
    return f"""
WITH t AS (SELECT {id_col} AS target_id,
                  list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS tvec FROM {table}),
q AS (SELECT {id_col} AS query_id,
             list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS qvec
      FROM {table} WHERE {queries_filter}),
tq AS (SELECT target_id, {quant('tvec')} AS tq FROM t),
qq AS (SELECT query_id, {quant('qvec')} AS qq FROM q),
s1 AS (
  SELECT query_id, target_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY {idot} DESC, target_id ASC) AS mrank
  FROM tq JOIN qq ON target_id <> query_id
),
surv AS (SELECT query_id, target_id FROM s1 WHERE mrank <= {m}),
scored AS (
  SELECT surv.query_id, surv.target_id,
         {_cos_sql('q.qvec', 't.tvec')} AS cosine
  FROM surv JOIN t ON t.target_id = surv.target_id
            JOIN q ON q.query_id = surv.query_id
),
ranked AS (
  SELECT query_id, target_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, target_id ASC) AS rank
  FROM scored
)
SELECT query_id, target_id, CAST(rank AS BIGINT) AS rank FROM ranked WHERE rank <= {k}
"""


# --- Arrow-vectorized exact top-k --------------------------------------------

def cosine_topk_arrow(embeddings: DataFrame, queries: DataFrame, k: int, *,
                      id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k, Arrow/NumPy path — the high-throughput twin of
    :func:`cosine_topk`.

    The HOF dot product is bit-exact against DuckDB's sequential fold but
    runs INTERPRETED (Spark never codegens lambdas) — ~10-50x off
    vectorized speed.  Here queries are collected to a driver matrix
    (queries are the small side by contract), each Arrow batch of targets
    computes the full batch x query cosine matrix with BLAS, keeps the
    per-batch top-k per query (lexsort: cosine desc, id asc — stable
    ties), and a final window ranks the k-per-query-per-batch survivors —
    the classic distributed brute-force kNN shape, shuffling only
    O(k * n_batches) rows per query.

    BLAS pairwise summation rounds differently than the sequential fold,
    so COSINES differ by ulps from :func:`cosine_topk`; the (query_id,
    target_id, rank) OUTPUT is identical unless two cosines tie within
    ~1 ulp (vanishing on real embeddings; equality on the test corpora is
    pinned by pytest, and the driver value-checks it against the same SQL
    oracle as the HOF path).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    qrows = queries.select(F.col(id_col), F.col(vec_col).cast("array<double>")).collect()
    if not qrows:
        # match cosine_topk: a filter selecting no queries yields an empty
        # result, not an error (the Column twin's broadcast join does this
        # implicitly)
        return _empty_ranked(embeddings)
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    qmat = np.array([r[1] for r in qrows], dtype=np.float64)
    qn = np.linalg.norm(qmat, axis=1, keepdims=True)
    qmat = np.divide(qmat, np.where(qn > 0, qn, 1.0))

    schema = T.StructType([
        T.StructField("query_id", T.LongType()),
        T.StructField("target_id", T.LongType()),
        T.StructField("cosine", T.DoubleType()),
    ])

    def score(batches):
        for pdf in batches:
            ids = pdf["__id"].to_numpy(dtype=np.int64)
            tmat = np.array(list(pdf["__vec"]), dtype=np.float64)
            tn = np.linalg.norm(tmat, axis=1, keepdims=True)
            tmat = np.divide(tmat, np.where(tn > 0, tn, 1.0))
            cos = tmat @ qmat.T                      # B x Q
            cos[ids[:, None] == qids[None, :]] = -np.inf  # self-matches out
            kk = min(k, cos.shape[0])
            out_q, out_t, out_c = [], [], []
            for j in range(cos.shape[1]):
                order = np.lexsort((ids, -cos[:, j]))[:kk]
                keep = order[np.isfinite(cos[order, j])]
                out_q.append(np.full(len(keep), qids[j], dtype=np.int64))
                out_t.append(ids[keep])
                out_c.append(cos[keep, j])
            yield pd.DataFrame({
                "query_id": np.concatenate(out_q) if out_q else np.array([], dtype=np.int64),
                "target_id": np.concatenate(out_t) if out_t else np.array([], dtype=np.int64),
                "cosine": np.concatenate(out_c) if out_c else np.array([], dtype=np.float64),
            })

    src = embeddings.select(F.col(id_col).alias("__id"),
                            F.col(vec_col).cast("array<double>").alias("__vec"))
    partial = src.mapInPandas(score, schema)
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               F.col("target_id").asc())
    return (partial.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "target_id", "rank"))


def _buckets_arrow(df: DataFrame, id_name: str, vec_name: str, dim: int,
                   out_name: str = "bucket",
                   n_planes: int = N_PLANES) -> DataFrame:
    """(id, bucket) via one BLAS matmul per Arrow batch against the
    precomputed plane matrix — the vectorized twin of
    :func:`bucket_key_col` (whose 8 interpreted fold-lambdas dominate the
    LSH wall time; HOFs are never codegen'd).  Sign bits agree with the
    sequential fold unless a projection ties zero within ulps (measure-zero
    on real embeddings; equality on the test corpora pinned by pytest)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    planes = np.array(_plane_weights(dim, n_planes), dtype=np.float64)  # P x dim
    powers = (1 << np.arange(n_planes)).astype(np.int64)

    schema = T.StructType([
        T.StructField(id_name, T.LongType()),
        T.StructField(out_name, T.LongType()),
    ])

    def score(batches):
        for pdf in batches:
            ids = pdf[id_name].to_numpy(dtype=np.int64)
            vecs = np.array(list(pdf[vec_name]), dtype=np.float64)
            proj = vecs @ planes.T                      # B x P
            buckets = ((proj > 0) @ powers).astype(np.int64)
            yield pd.DataFrame({id_name: ids, out_name: buckets})

    return df.select(F.col(id_name),
                     F.col(vec_name).cast("array<double>").alias(vec_name)) \
             .mapInPandas(score, schema)


def lsh_bucket_topk_arrow(embeddings: DataFrame, queries: DataFrame, k: int, *,
                          id_col: str = "vec_id", vec_col: str = "embedding",
                          dim: int | None = None) -> DataFrame:
    """Arrow-bucketed twin of :func:`lsh_bucket_topk` (multiprobe on):
    buckets via BLAS (ids-only frames — vectors never ride the bucket
    join), exact HOF rescore of the small candidate sets, identical
    ranking.  Same oracle as the Column path."""
    if dim is None:
        dim = _infer_dim(embeddings, vec_col)
    t = embeddings.select(F.col(id_col).alias("target_id"),
                          F.col(vec_col).cast("array<double>").alias("tvec"))
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).cast("array<double>").alias("qvec"))
    tb = _buckets_arrow(embeddings.select(F.col(id_col).alias("target_id"),
                                          F.col(vec_col).alias("v")),
                        "target_id", "v", dim)
    qb0 = _buckets_arrow(queries.select(F.col(id_col).alias("query_id"),
                                        F.col(vec_col).alias("v")),
                         "query_id", "v", dim, out_name="qbucket")
    probes = F.array(F.col("qbucket"),
                     *[F.col("qbucket").bitwiseXOR(F.lit(1 << p)) for p in range(N_PLANES)])
    qb = qb0.withColumn("bucket", F.explode(probes)).drop("qbucket")
    cand = (tb.join(F.broadcast(qb), "bucket")
            .filter(F.col("target_id") != F.col("query_id"))
            .select("query_id", "target_id")
            .join(t, "target_id").join(q, "query_id"))
    cos = _cosine(F.col("qvec"), F.col("tvec"))
    scored = cand.select("query_id", "target_id", cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("target_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "target_id", "rank"))


def quantized_topk_arrow(embeddings: DataFrame, queries: DataFrame, k: int, *,
                         m: int = QUANT_TOPM,
                         id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Arrow/NumPy twin of :func:`quantized_topk` — removes the full N x Q
    window sort from stage 1.

    The Column path scores every target against every query with an
    interpreted HOF integer dot, then sorts ALL N rows per query to keep the
    top ``m`` — a full sort-shuffle whose row count the int8 payload does
    not shrink.  Here each Arrow batch quantizes its targets (the identical
    floor(x * 127/max|x|) scheme — float64 multiply + floor, bit-identical
    to the Column/SQL paths), computes the batch x query INTEGER dot matrix
    (int64 matmul — exact), and keeps the per-batch top ``m`` per query
    (idot desc, id asc lexsort); the final stage-1 window ranks only
    O(m * n_batches) survivor rows.  Integer scores are engine-exact, so
    the survivor SET — and therefore the exact-rescore stage-2 output — is
    the same as :func:`quantized_topk` and shares its SQL oracle
    (:func:`quantized_topk_sql`).

    At 10^12 targets the int8 copy is what ships through the scan (8x fewer
    bytes/dim than float64) and per-executor matmuls replace the global
    sort — the same shape as :func:`cosine_topk_arrow`, with the integer
    stage keeping bit-exactness that a float BLAS stage cannot.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    qrows = queries.select(F.col(id_col), F.col(vec_col).cast("array<double>")).collect()
    if not qrows:
        return _empty_ranked(embeddings)
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    qmat = np.array([r[1] for r in qrows], dtype=np.float64)

    def quant_np(mat: "np.ndarray") -> "np.ndarray":
        # same arithmetic as the Column/SQL quantizer: scale = 127/max|x|
        # (0 for the zero vector), value = floor(x * scale) — float64
        # multiply then floor, so every int matches both engines exactly
        mx = np.abs(mat).max(axis=1, keepdims=True)
        scale = np.divide(127.0, mx, out=np.zeros_like(mx), where=mx > 0)
        return np.floor(mat * scale).astype(np.int64)

    qq = quant_np(qmat)                                  # Q x D int64

    schema = T.StructType([
        T.StructField("query_id", T.LongType()),
        T.StructField("target_id", T.LongType()),
        T.StructField("idot", T.LongType()),
    ])

    def score(batches):
        for pdf in batches:
            ids = pdf["__id"].to_numpy(dtype=np.int64)
            tq = quant_np(np.array(list(pdf["__vec"]), dtype=np.float64))
            idot = tq @ qq.T                             # B x Q, exact int64
            mm = min(m, idot.shape[0])
            out_q, out_t, out_d = [], [], []
            for j in range(idot.shape[1]):
                keep = np.flatnonzero(ids != qids[j])    # self-matches out
                order = keep[np.lexsort((ids[keep], -idot[keep, j]))][:mm]
                out_q.append(np.full(len(order), qids[j], dtype=np.int64))
                out_t.append(ids[order])
                out_d.append(idot[order, j])
            yield pd.DataFrame({
                "query_id": np.concatenate(out_q) if out_q else np.array([], dtype=np.int64),
                "target_id": np.concatenate(out_t) if out_t else np.array([], dtype=np.int64),
                "idot": np.concatenate(out_d) if out_d else np.array([], dtype=np.int64),
            })

    src = embeddings.select(F.col(id_col).alias("__id"),
                            F.col(vec_col).cast("array<double>").alias("__vec"))
    partial = src.mapInPandas(score, schema)
    w1 = Window.partitionBy("query_id").orderBy(F.col("idot").desc(),
                                                F.col("target_id").asc())
    survivors = (partial.withColumn("mrank", F.row_number().over(w1))
                 .filter(F.col("mrank") <= m)
                 .select("query_id", "target_id"))

    # stage 2: identical exact-double rescore of the m survivors per query
    t = embeddings.select(F.col(id_col).alias("target_id"),
                          F.col(vec_col).cast("array<double>").alias("tvec"))
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).cast("array<double>").alias("qvec"))
    cand = survivors.join(t, "target_id").join(
        q.withColumnRenamed("query_id", "qid2"),
        F.col("query_id") == F.col("qid2")).drop("qid2")
    cos = _cosine(F.col("qvec"), F.col("tvec"))
    w2 = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                                F.col("target_id").asc())
    return (cand.select("query_id", "target_id", cos.alias("cosine"))
            .withColumn("rank", F.row_number().over(w2))
            .filter(F.col("rank") <= k)
            .select("query_id", "target_id", "rank"))


def ivf_topk_arrow(embeddings: DataFrame, queries: DataFrame, k: int, *,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   n_probe: int = IVF_NPROBE,
                   n_centroids: int = IVF_CENTROID_BUDGET,
                   n_vectors: int | None = None,
                   centroids: DataFrame | None = None) -> DataFrame:
    """Arrow-assigned twin of :func:`ivf_topk`: the centroid table (a fixed
    budget, so always driver-small) is collected once and every Arrow batch
    assigns its vectors with one BLAS cosine matrix — the Column path's
    interpreted per-row centroid cosines were the dominant cost.  Ties
    break to the lowest centroid id exactly like the Column/SQL paths; the
    list equi-join and the exact HOF rescore are identical, so the same
    oracle applies (assignment flips would need a cosine tie within ulps).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    if centroids is not None:
        crows = (centroids.select(F.col("cid"),
                                  F.col("cvec").cast("array<double>"))
                 .collect())
    else:
        n = n_vectors if n_vectors is not None else embeddings.count()
        mod = _centroid_modulus(n, n_centroids)
        crows = (embeddings.filter(F.col(id_col) % mod == 0)
                 .select(F.col(id_col), F.col(vec_col).cast("array<double>"))
                 .collect())
    if not crows:
        raise ValueError("ivf_topk_arrow: empty centroid set")
    cids = np.array([r[0] for r in crows], dtype=np.int64)
    cmat = np.array([r[1] for r in crows], dtype=np.float64)
    cn = np.linalg.norm(cmat, axis=1, keepdims=True)
    cmat = np.divide(cmat, np.where(cn > 0, cn, 1.0))
    zero_cent = (cn[:, 0] == 0)

    def assign(keep: int, out_id: str):
        schema = T.StructType([T.StructField(out_id, T.LongType()),
                               T.StructField("list_id", T.LongType())])

        def run(batches):
            for pdf in batches:
                ids = pdf[out_id].to_numpy(dtype=np.int64)
                vmat = np.array(list(pdf["__vec"]), dtype=np.float64)
                vn = np.linalg.norm(vmat, axis=1, keepdims=True)
                vmat = np.divide(vmat, np.where(vn > 0, vn, 1.0))
                cos = vmat @ cmat.T                     # B x C
                # zero-norm pairs score 0.0 (the _cosine guard's semantics)
                cos[:, zero_cent] = 0.0
                cos[vn[:, 0] == 0, :] = 0.0
                out_i, out_l = [], []
                for b in range(cos.shape[0]):
                    order = np.lexsort((cids, -cos[b]))[:keep]
                    out_i.append(np.full(len(order), ids[b], dtype=np.int64))
                    out_l.append(cids[order])
                yield pd.DataFrame({
                    out_id: np.concatenate(out_i) if out_i else np.array([], dtype=np.int64),
                    "list_id": np.concatenate(out_l) if out_l else np.array([], dtype=np.int64),
                })
        return run, schema

    t_src = embeddings.select(F.col(id_col).alias("target_id"),
                              F.col(vec_col).cast("array<double>").alias("__vec"))
    q_src = queries.select(F.col(id_col).alias("query_id"),
                           F.col(vec_col).cast("array<double>").alias("__vec"))
    run_t, sch_t = assign(1, "target_id")
    run_q, sch_q = assign(n_probe, "query_id")
    t_assigned = t_src.mapInPandas(run_t, sch_t)
    q_probed = q_src.mapInPandas(run_q, sch_q)

    t = embeddings.select(F.col(id_col).alias("target_id"),
                          F.col(vec_col).cast("array<double>").alias("tvec"))
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).cast("array<double>").alias("qvec"))
    cand = (t_assigned.join(F.broadcast(q_probed), "list_id")
            .filter(F.col("target_id") != F.col("query_id"))
            .select("query_id", "target_id")
            .join(t, "target_id").join(q, "query_id"))
    cos = _cosine(F.col("qvec"), F.col("tvec"))
    scored = cand.select("query_id", "target_id", cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("target_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "target_id", "rank"))
