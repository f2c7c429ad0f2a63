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

    ``queries`` is small and collected driver-side (the same contract the
    broadcast join enforced); excludes self-matches.

    r8: the former interpreted-HOF broadcast join scored every (target,
    query) pair with ~10-50x-off-vectorized lambda expressions (Spark never
    codegens HOF lambdas) and shuffled ALL N x Q scored rows into the
    ranking window — 328 s at sf1.0.  Now one mapInPandas pass computes
    dim-ordered fold cosines (bit-identical to the HOF/DuckDB left fold —
    see the fold helpers above) and emits only per-batch top-k partials, so
    the window ranks O(k * n_batches) rows per query.  Output is
    bit-identical: same cosines, same ties, same ranks."""
    qids, qmat = _collect_queries(queries, id_col, vec_col)
    if qids is None:
        return _empty_ranked(embeddings)
    partial = _ranked_topk_partials(embeddings, qids, qmat, k,
                                    id_col=id_col, vec_col=vec_col)
    return _rank_partials(partial, k)


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


# --- dim-ordered fold arithmetic (bit-exact NumPy twins of the HOF exprs) ----
#
# F.aggregate(zip_with(a, b, x*y), 0.0, acc+v) is a SEQUENTIAL left fold:
# acc_{i+1} = acc_i + a[i]*b[i] in element order.  The same recurrence can be
# vectorized ACROSS ROWS while keeping the per-row operation order: loop over
# the dimension index and accumulate one elementwise product per step.  Every
# intermediate is the same IEEE-double value the interpreted HOF (and the
# DuckDB list_sum twin) produces, so cosines — and therefore ranks, ties and
# threshold decisions — are bit-identical, at NumPy speed instead of
# interpreted-expression speed (Spark never codegens lambdas; guide §4).

#: guard band for GEMM-assisted candidate selection: ~10^4 x the worst
#: pairwise-vs-sequential summation divergence for dim <= 10^4 (~dim*eps);
#: selection uses it, decisions never do — they re-run the exact fold.
_TOPK_BAND = 1e-9


def _fold_norms_np(mat):
    """Per-row sequential sum of squares of an (N, dim) float64 matrix —
    the dim-ordered twin of :func:`_norm2`."""
    import numpy as np
    acc = np.zeros(mat.shape[0])
    for i in range(mat.shape[1]):
        v = mat[:, i]
        acc = acc + v * v
    return acc


def _fold_dot_rows_np(a, b):
    """Row-paired sequential dot of two (N, dim) float64 matrices — the
    dim-ordered twin of :func:`_dot` on N (a_row, b_row) pairs."""
    import numpy as np
    acc = np.zeros(a.shape[0])
    for i in range(a.shape[1]):
        acc = acc + a[:, i] * b[:, i]
    return acc


def _fold_dot_vec_np(a, v):
    """Sequential dot of every row of an (N, dim) matrix against ONE dim
    vector — the dim-ordered twin of :func:`_dot` with a shared right side."""
    import numpy as np
    acc = np.zeros(a.shape[0])
    for i in range(a.shape[1]):
        acc = acc + a[:, i] * v[i]
    return acc


def _fold_dot_matrix_np(a, q):
    """All-pairs sequential dot: (B, dim) x (Q, dim) -> (B, Q), each cell
    accumulated in dimension order (the brute-force twin of :func:`_dot`).
    O(B*Q) memory — callers bound B via Arrow batch size."""
    import numpy as np
    acc = np.zeros((a.shape[0], q.shape[0]))
    for i in range(a.shape[1]):
        acc = acc + a[:, i, None] * q[None, :, i]
    return acc


def _guarded_cos_np(dot, na2, nb2):
    """cosine from fold dot + fold norms with the :func:`_cosine` zero-norm
    guard, same op order: n2 = na2*nb2; dot/sqrt(n2) when n2 > 0 else 0."""
    import numpy as np
    n2 = na2 * nb2
    return np.divide(dot, np.sqrt(n2), out=np.zeros_like(dot), where=n2 > 0)


def _fold_proj_np(mat, planes):
    """(N, P) hyperplane projections of an (N, dim) float64 matrix, each
    accumulated in dimension order — the twin of :func:`bucket_key_col`'s
    per-plane aggregate(zip_with(vec, w, x*w))."""
    import numpy as np
    acc = np.zeros((mat.shape[0], planes.shape[0]))
    for i in range(mat.shape[1]):
        acc = acc + mat[:, i, None] * planes[None, :, i]
    return acc


def _fold_buckets_np(mat, planes, powers):
    """Sign-bit LSH bucket ids from dim-ordered fold projections — bit-exact
    twin of :func:`bucket_key_col` (not ulp-approximate like a BLAS matmul:
    the fold order is preserved, so a projection that the Column path rounds
    to exactly 0.0 rounds to 0.0 here too)."""
    proj = _fold_proj_np(mat, planes)
    return ((proj > 0) @ powers).astype("int64")


def _vec_matrix(series):
    """(N, dim) float64 matrix from an Arrow-batch pandas column of
    embedding arrays (float32 -> float64 widening is exact)."""
    import numpy as np
    return np.array(list(series), dtype=np.float64)


def _collect_queries(queries: DataFrame, id_col: str, vec_col: str):
    """Driver-side (qids, qmat) — queries are the small side by contract
    (same collect the Arrow twins have always done)."""
    import numpy as np
    rows = queries.select(F.col(id_col),
                          F.col(vec_col).cast("array<double>")).collect()
    if not rows:
        return None, None
    qids = np.array([r[0] for r in rows], dtype=np.int64)
    qmat = np.array([r[1] for r in rows], dtype=np.float64)
    return qids, qmat


def _spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the session's default parallelism so a
    single-file parquet scan does not serialize the whole mapInPandas stage
    through one task (observed: the embedding table reads as 1-2 input
    splits, so every ANN map stage ran on <= 2 of 32 cores).  Result sets
    are batching-invariant (per-batch top-k is a superset filter), so the
    round-robin placement never changes output."""
    from polycheck_spark.session import spread
    return spread(df)


def _ranked_topk_partials(embeddings: DataFrame, qids, qmat, k: int, *,
                          id_col: str, vec_col: str,
                          pair_mask=None) -> DataFrame:
    """(query_id, target_id, cosine) per-batch exact top-k partials.

    One pass over the targets: each Arrow batch computes dim-ordered fold
    cosines against the driver-side query matrix (all pairs, or only the
    pairs ``pair_mask(ids, tmat) -> (B, Q) bool`` admits), drops
    self-matches, and emits its per-query top-k by (cosine desc, id asc).
    Because emitted cosines ARE the exact fold values, the caller's final
    window reproduces the interpreted-HOF ranking bit-for-bit; per-batch
    top-k only prunes rows that can never reach the global top k."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    qn2 = _fold_norms_np(qmat)
    schema = T.StructType([
        T.StructField("query_id", T.LongType()),
        T.StructField("target_id", T.LongType()),
        T.StructField("cosine", T.DoubleType()),
    ])

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["__id"].to_numpy(dtype=np.int64)
            tmat = _vec_matrix(pdf["__vec"])
            tn2 = _fold_norms_np(tmat)
            if pair_mask is None:
                # brute force: BLAS GEMM picks each query's per-batch
                # candidates with a guard band, then the dim-ordered fold
                # rescores ONLY those ~k rows — bit-exact output at GEMM
                # speed (a full fold matrix measured 4.8x slower at the
                # 16M-vector scaling workload).  Soundness: per-row
                # |gemm - fold| <= ~dim*eps (~1e-14 at dim 10^4), so with
                # BAND = 1e-9 any true top-k row r has gemm_r >= fold_r -
                # BAND/2 >= fold_kth - BAND/2 >= gemm_kth - BAND (order
                # statistics are 1-Lipschitz in sup norm) — always inside
                # the selection; ties are then decided on exact folds.
                tn = np.sqrt(tn2)[:, None]
                qn = np.sqrt(qn2)[:, None]
                gemm = (np.divide(tmat, np.where(tn > 0, tn, 1.0))
                        @ np.divide(qmat, np.where(qn > 0, qn, 1.0)).T)
                gemm[ids[:, None] == qids[None, :]] = -np.inf
                kk = min(k, gemm.shape[0])
                out_q, out_t, out_c = [], [], []
                for j in range(gemm.shape[1]):
                    col = gemm[:, j]
                    thresh = np.partition(col, -kk)[-kk] - _TOPK_BAND
                    # isfinite: a batch holding only the query itself has
                    # an all--inf column, and -inf >= -inf would select it
                    sel = np.flatnonzero((col >= thresh) & np.isfinite(col))
                    if not len(sel):
                        continue
                    cos = _guarded_cos_np(
                        _fold_dot_vec_np(tmat[sel], qmat[j]),
                        tn2[sel], qn2[j])
                    order = np.lexsort((ids[sel], -cos))[:kk]
                    out_q.append(np.full(len(order), qids[j], dtype=np.int64))
                    out_t.append(ids[sel[order]])
                    out_c.append(cos[order])
                yield pd.DataFrame({
                    "query_id": np.concatenate(out_q) if out_q else np.array([], dtype=np.int64),
                    "target_id": np.concatenate(out_t) if out_t else np.array([], dtype=np.int64),
                    "cosine": np.concatenate(out_c) if out_c else np.array([], dtype=np.float64),
                })
                continue
            mask = pair_mask(ids, tmat)
            mask &= ids[:, None] != qids[None, :]
            bi, qi = np.nonzero(mask)
            if not len(bi):
                continue
            dot = _fold_dot_rows_np(tmat[bi], qmat[qi])
            cos = _guarded_cos_np(dot, tn2[bi], qn2[qi])
            order = np.lexsort((ids[bi], -cos, qi))
            qs = qi[order]
            idx = np.arange(len(qs))
            starts = np.where(np.r_[True, qs[1:] != qs[:-1]], idx, 0)
            rank_in_q = idx - np.maximum.accumulate(starts)
            keep = order[rank_in_q < k]
            yield pd.DataFrame({
                "query_id": qids[qi[keep]],
                "target_id": ids[bi[keep]],
                "cosine": cos[keep],
            })

    src = _spread(embeddings.select(F.col(id_col).alias("__id"),
                                    F.col(vec_col).alias("__vec")))
    return src.mapInPandas(score, schema)


def _rank_partials(partial: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               F.col("target_id").asc())
    return (partial.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "target_id", "rank"))


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

    r8: assignment + rescore now run as ONE fold-exact mapInPandas pass
    (see :func:`cosine_topk`): the centroid table (fixed budget — always
    driver-small) is collected once, each target batch fold-assigns its
    vectors (argmax over cid-ascending centroids = max cosine, tie ->
    lowest cid, exactly the former groupBy(max(struct)) semantics), masks
    itself against the driver-side query probe lists, and fold-rescores
    only admitted pairs.  A target sits in exactly ONE list and a query's
    probed lists are pairwise distinct, so each pair is considered at most
    once (invariant pinned by test_ann_outputs_have_no_duplicate_pairs);
    cosines, ties and ranks are bit-identical to the former join."""
    import numpy as np
    if centroids is not None:
        crows = centroids.select(F.col("cid"),
                                 F.col("cvec").cast("array<double>")).collect()
    else:
        n = n_vectors if n_vectors is not None else embeddings.count()
        mod = _centroid_modulus(n, n_centroids)
        crows = (embeddings.filter(F.col(id_col) % mod == 0)
                 .select(F.col(id_col), F.col(vec_col).cast("array<double>"))
                 .collect())
    qids, qmat = _collect_queries(queries, id_col, vec_col)
    if qids is None or not crows:
        # empty queries or an empty centroid set both joined to nothing in
        # the former Column plan — preserve that, don't raise
        return _empty_ranked(embeddings)
    crows.sort(key=lambda r: r[0])              # cid ascending: first max
    cids = np.array([r[0] for r in crows], dtype=np.int64)
    cmat = np.array([r[1] for r in crows], dtype=np.float64)
    cn2 = _fold_norms_np(cmat)
    qn2 = _fold_norms_np(qmat)
    qcos = _guarded_cos_np(_fold_dot_matrix_np(qmat, cmat),
                           qn2[:, None], cn2[None, :])
    keepn = min(n_probe, len(cids))
    qprobe = np.stack([cids[np.lexsort((cids, -qcos[j]))[:keepn]]
                       for j in range(len(qids))])       # Q x n_probe

    def pair_mask(ids, tmat):
        tn2 = _fold_norms_np(tmat)
        tcos = _guarded_cos_np(_fold_dot_matrix_np(tmat, cmat),
                               tn2[:, None], cn2[None, :])
        assign = cids[np.argmax(tcos, axis=1)]  # first max -> lowest cid
        return (assign[:, None, None] == qprobe[None, :, :]).any(axis=2)

    partial = _ranked_topk_partials(embeddings, qids, qmat, k,
                                    id_col=id_col, vec_col=vec_col,
                                    pair_mask=pair_mask)
    return _rank_partials(partial, k)


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
    precomputed literal plane weights — no per-row md5.

    r8: one mapInPandas pass replaces the interpreted-HOF bucketer + rescore
    (both ran as uncompiled lambdas) and the bucket join: each target batch
    derives its buckets with the dim-ordered fold (bit-exact vs
    :func:`bucket_key_col`), masks itself against the driver-side query
    probe sets, fold-rescores only the admitted pairs, and emits per-batch
    top-k partials.  Candidate set, cosines, ties and ranks are identical
    to the former join (a target has ONE bucket and a query's probe keys
    are pairwise distinct, so each pair is considered at most once)."""
    import numpy as np
    if dim is None:
        dim = _infer_dim(embeddings, vec_col)
    qids, qmat = _collect_queries(queries, id_col, vec_col)
    if qids is None:
        return _empty_ranked(embeddings)
    planes = np.array(_plane_weights(dim, N_PLANES), dtype=np.float64)
    powers = (1 << np.arange(N_PLANES)).astype(np.int64)
    qb = _fold_buckets_np(qmat, planes, powers)
    if multiprobe:
        probe_arr = np.stack([qb] + [qb ^ (1 << p) for p in range(N_PLANES)],
                             axis=1)                     # Q x (P+1)
    else:
        probe_arr = qb[:, None]

    def pair_mask(ids, tmat):
        tb = _fold_buckets_np(tmat, planes, powers)
        return (tb[:, None, None] == probe_arr[None, :, :]).any(axis=2)

    partial = _ranked_topk_partials(embeddings, qids, qmat, k,
                                    id_col=id_col, vec_col=vec_col,
                                    pair_mask=pair_mask)
    return _rank_partials(partial, k)


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
    vectors yields ~S^2 candidate rows, so one degenerate bucket (e.g.
    millions of near-zero or boilerplate embeddings hashing alike) melts
    the rescore at 100x data.  With the cap, buckets whose exact-key
    population exceeds it are dropped from candidate generation entirely —
    strictly conservative (capped output is a subset of uncapped).  None
    disables the cap (exact LSH semantics; what the driver oracle checks).

    ``n_planes``: LSH plane count — pass the same count to
    :func:`near_dup_pairs_sql` when verifying (its plane derivation is
    width-parameterized too); size it ~log2(N / target_bucket_population)
    at corpus scale so per-bucket candidate cost stays constant (see
    :func:`bucket_key_col` and jobs/near_dup_job.py; scale settings are
    additionally recall-pinned by the stress harness).

    r8 shape (guide §8: decide locally, move heavy bytes once): the former
    path shuffled CANDIDATE-PAIR ids out of the bucket join and then
    attached both vectors to every pair with two id joins — at sf1.0 that
    shipped each vector once per candidate pair (~pairs x 2 x 512 B, the
    dominant exchange) into an interpreted-HOF rescore (165 s; the Arrow
    variant still paid the joins, 31 s).  Now ONE mapInPandas pass stamps
    each vector with its dim-ordered-fold bucket (bit-exact vs
    :func:`bucket_key_col`), the exact side groups by bucket, the probe
    side explodes its n_planes+1 probe keys, and a cogrouped applyInPandas
    rescore forms the per-bucket pair matrix IN MEMORY with fold cosines —
    vectors ride the shuffle (n_planes + 2) times total, independent of the
    candidate count, and only passing (a, b) pairs are emitted.  The
    accepted set is bit-identical: same buckets, same probe keys, same
    fold cosine, same rational-threshold comparison.  ``impl`` is kept for
    API compatibility — 'column' and 'arrow' now run this same pipeline
    (their former outputs were pinned equal by pytest).
    """
    import numpy as np
    import pandas as pd

    num, den = threshold
    if mode == "exact":
        t = embeddings.select(F.col(id_col).alias("a"),
                              F.col(vec_col).cast("array<double>").alias("avec"))
        u = embeddings.select(F.col(id_col).alias("b"),
                              F.col(vec_col).cast("array<double>").alias("bvec"))
        cand = t.join(u, F.col("a") < F.col("b"))
        cos = _cosine(F.col("avec"), F.col("bvec"))
        return (cand.withColumn("cosine", cos)
                .filter(F.col("cosine") * den >= F.lit(num))
                .select("a", "b"))
    if mode != "lsh":
        raise ValueError("mode must be 'lsh' or 'exact'")
    if dim is None:
        dim = _infer_dim(embeddings, vec_col)

    planes = np.array(_plane_weights(dim, n_planes), dtype=np.float64)
    powers = (1 << np.arange(n_planes)).astype(np.int64)

    def bucketize(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            buckets = _fold_buckets_np(_vec_matrix(pdf["v"]), planes, powers)
            yield pd.DataFrame({"vid": pdf["vid"].to_numpy(dtype=np.int64),
                                "bucket": buckets,
                                "v": pdf["v"]})

    # vectors stay float32 through the shuffle (the fold widens to float64
    # in-memory, exactly like the former cast-then-join did) — half the
    # exchange bytes of the old array<double> join sides (guide §2.3)
    src = _spread(embeddings.select(F.col(id_col).alias("vid"),
                                    F.col(vec_col).alias("v")))
    bk = src.mapInPandas(bucketize, "vid long, bucket long, v array<float>") \
            .localCheckpoint(eager=False)   # ONE bucketing pass feeds both sides
    probes = F.array(F.col("bucket"),
                     *[F.col("bucket").bitwiseXOR(F.lit(1 << p))
                       for p in range(n_planes)])
    # the probe side re-aliases EVERY column with fresh names: both cogroup
    # sides derive from the same checkpointed frame, and shared attribute
    # ids across the two children make the Python-runner argument dedup
    # collapse the probe side's payload columns into the exact side's
    # (observed as a right-side frame holding only the key column) — the
    # same self-join-over-checkpoint trap connected_components documents
    pr = bk.select(F.col("vid").alias("pvid"), F.col("v").alias("pv"),
                   F.explode(probes).alias("pbucket"))

    cap = max_bucket_freq

    def rescore(ex_pdf, pr_pdf):
        out_a, out_b = [], []
        # the hot-bucket cap counts EXACT-side population — a capped bucket
        # contributes no pairs at all, exactly the former cool-semi-join
        if len(ex_pdf) and len(pr_pdf) and (cap is None or len(ex_pdf) <= cap):
            a_ids = ex_pdf["vid"].to_numpy(dtype=np.int64)
            b_ids = pr_pdf["pvid"].to_numpy(dtype=np.int64)
            amat = _vec_matrix(ex_pdf["v"])
            bmat = _vec_matrix(pr_pdf["pv"])
            na2 = _fold_norms_np(amat)
            nb2 = _fold_norms_np(bmat)
            # GEMM margins decide every pair clear of the threshold by
            # the guard band; the (empirically empty) boundary band is
            # re-decided with the exact dim-ordered fold — the accepted
            # set is bit-identical to an all-fold rescore at BLAS speed
            # (band analysis: see _TOPK_BAND; margins scale by den).
            an = np.sqrt(na2)[:, None]
            bn = np.sqrt(nb2)[:, None]
            amatn = np.divide(amat, np.where(an > 0, an, 1.0))
            bmatn = np.divide(bmat, np.where(bn > 0, bn, 1.0))
            band = _TOPK_BAND * den
            # chunk the exact side so the pair matrix stays bounded
            step = max(1, (1 << 22) // max(1, len(b_ids)))
            for lo in range(0, len(a_ids), step):
                hi = min(lo + step, len(a_ids))
                margin = (amatn[lo:hi] @ bmatn.T) * den - num
                ordered = a_ids[lo:hi, None] < b_ids[None, :]
                accept = ordered & (margin >= band)
                gray = ordered & (np.abs(margin) < band)
                gi, gj = np.nonzero(gray)
                if len(gi):
                    cos = _guarded_cos_np(
                        _fold_dot_rows_np(amat[lo:hi][gi], bmat[gj]),
                        na2[lo:hi][gi], nb2[gj])
                    accept[gi, gj] = cos * den >= num
                ai, bi = np.nonzero(accept)
                out_a.append(a_ids[lo:hi][ai])
                out_b.append(b_ids[bi])
        return pd.DataFrame({
            "a": np.concatenate(out_a) if out_a else np.array([], dtype=np.int64),
            "b": np.concatenate(out_b) if out_b else np.array([], dtype=np.int64),
        })

    return (bk.groupby("bucket").cogroup(pr.groupby("pbucket"))
            .applyInPandas(rescore, "a long, b long"))


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
    scan/shuffle — 8x fewer bytes than float64 (1 B/dim) — and per-executor
    integer matmuls replace the global sort.  Integer arithmetic is
    bit-identical across engines, so the survivor SET (ties broken by id)
    and therefore the final ranking are oracle-exact
    (:func:`quantized_topk_sql`).

    r8: the two stages are FUSED into one mapInPandas pass.  The former
    Column path scored every (target, query) pair with an interpreted HOF
    integer dot and sorted ALL N rows per query in a window (116 s at
    sf1.0); the former Arrow twin fixed stage 1 but still rejoined the
    float vectors by id for the stage-2 HOF rescore.  Now each target
    batch quantizes (identical floor(x * 127/max|x|) float64 arithmetic),
    computes the exact batch x query int64 dot matrix, keeps its per-batch
    top ``m`` per query (idot desc, id asc), and emits those rows with BOTH
    the integer score and the dim-ordered-fold exact cosine — so stage 1's
    global window ranks O(m * n_batches) rows, and stage 2 is a second sort
    over the same exchange with no vector rejoin.  Survivor set, cosines
    and ranks are bit-identical to both former paths."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    qids, qmat = _collect_queries(queries, id_col, vec_col)
    if qids is None:
        return _empty_ranked(embeddings)

    def quant_np(mat: "np.ndarray") -> "np.ndarray":
        # same arithmetic as the Column/SQL quantizer: scale = 127/max|x|
        # (0 for the zero vector), value = floor(x * scale) — float64
        # multiply then floor, so every int matches both engines exactly
        mx = np.abs(mat).max(axis=1, keepdims=True)
        scale = np.divide(127.0, mx, out=np.zeros_like(mx), where=mx > 0)
        return np.floor(mat * scale).astype(np.int64)

    qq = quant_np(qmat)                                  # Q x D int64
    qn2 = _fold_norms_np(qmat)

    schema = T.StructType([
        T.StructField("query_id", T.LongType()),
        T.StructField("target_id", T.LongType()),
        T.StructField("idot", T.LongType()),
        T.StructField("cosine", T.DoubleType()),
    ])

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["__id"].to_numpy(dtype=np.int64)
            tmat = _vec_matrix(pdf["__vec"])
            tq = quant_np(tmat)
            # float64 GEMM on int8-range values is EXACT (|products| <=
            # 127^2 and partial sums stay integers far below 2^53 for any
            # dim < 5e11) and runs BLAS instead of NumPy's slow int64
            # matmul loop
            idot = np.rint(tq.astype(np.float64)
                           @ qq.T.astype(np.float64)).astype(np.int64)
            tn2 = _fold_norms_np(tmat)
            mm = min(m, idot.shape[0])
            sel_b, sel_q = [], []
            for j in range(idot.shape[1]):
                keep = np.flatnonzero(ids != qids[j])    # self-matches out
                order = keep[np.lexsort((ids[keep], -idot[keep, j]))][:mm]
                sel_b.append(order)
                sel_q.append(np.full(len(order), j, dtype=np.int64))
            bi = np.concatenate(sel_b) if sel_b else np.array([], dtype=np.int64)
            qi = np.concatenate(sel_q) if sel_q else np.array([], dtype=np.int64)
            if not len(bi):
                continue
            cos = _guarded_cos_np(_fold_dot_rows_np(tmat[bi], qmat[qi]),
                                  tn2[bi], qn2[qi])
            yield pd.DataFrame({
                "query_id": qids[qi],
                "target_id": ids[bi],
                "idot": idot[bi, qi],
                "cosine": cos,
            })

    src = _spread(embeddings.select(F.col(id_col).alias("__id"),
                                    F.col(vec_col).alias("__vec")))
    partial = src.mapInPandas(score, schema)
    w1 = Window.partitionBy("query_id").orderBy(F.col("idot").desc(),
                                                F.col("target_id").asc())
    w2 = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                                F.col("target_id").asc())
    return (partial.withColumn("mrank", F.row_number().over(w1))
            .filter(F.col("mrank") <= m)
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

    r8: the partial-scoring pass now uses the dim-ordered fold (bit-exact
    against the HOF/DuckDB sequential fold at the same vectorized speed —
    the former BLAS matmul differed by ulps, which was only
    tie-probabilistically safe), so this twin is exactly
    :func:`cosine_topk` and shares its implementation."""
    return cosine_topk(embeddings, queries, k, id_col=id_col, vec_col=vec_col)


def lsh_bucket_topk_arrow(embeddings: DataFrame, queries: DataFrame, k: int, *,
                          id_col: str = "vec_id", vec_col: str = "embedding",
                          dim: int | None = None) -> DataFrame:
    """Arrow twin of :func:`lsh_bucket_topk` (multiprobe on).

    r8: the Column path now IS the single-pass fold-exact Arrow pipeline
    (its former BLAS bucketer + ids-only join + interpreted-HOF rescore
    paid two extra vector rejoins and an uncompiled rescore), so this twin
    delegates — same buckets, same cosines, same oracle."""
    return lsh_bucket_topk(embeddings, queries, k, id_col=id_col,
                           vec_col=vec_col, dim=dim)


def quantized_topk_arrow(embeddings: DataFrame, queries: DataFrame, k: int, *,
                         m: int = QUANT_TOPM,
                         id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Arrow twin of :func:`quantized_topk`.

    r8: the Column path now IS the fused one-pass int8 + fold-exact
    pipeline (the former twin still rejoined float vectors by id for the
    stage-2 HOF rescore), so this twin delegates — same integer stage-1
    scores, same exact rescore, same oracle."""
    return quantized_topk(embeddings, queries, k, m=m,
                          id_col=id_col, vec_col=vec_col)


def ivf_topk_arrow(embeddings: DataFrame, queries: DataFrame, k: int, *,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   n_probe: int = IVF_NPROBE,
                   n_centroids: int = IVF_CENTROID_BUDGET,
                   n_vectors: int | None = None,
                   centroids: DataFrame | None = None) -> DataFrame:
    """Arrow twin of :func:`ivf_topk`.

    r8: the Column path now IS the single-pass fold-exact Arrow pipeline
    (its former shape paid two assignment mapInPandas passes, a list join
    and an interpreted-HOF rescore with two vector rejoins), so this twin
    delegates — same centroids, same assignment, same oracle."""
    return ivf_topk(embeddings, queries, k, id_col=id_col, vec_col=vec_col,
                    n_probe=n_probe, n_centroids=n_centroids,
                    n_vectors=n_vectors, centroids=centroids)
