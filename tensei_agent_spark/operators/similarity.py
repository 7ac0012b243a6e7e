"""Vector similarity search over an embedding column (array<float>).

Beyond-reference surface for training-data pipelines. Two paths:

- ``brute_force_topk`` — exact top-k: query set × corpus equi-agnostic
  join. The corpus never collects to the driver; queries are broadcast
  (a query set is small by definition). At 100 TB the corpus stays
  partitioned and each partition scores locally — a map-side cross
  product bounded by |queries| × |partition|.
- ``lsh_bucket_topk`` — approximate: random-hyperplane signs bucket the
  corpus (SimHash for vectors); only same-bucket candidates are scored.
  Bucket width (n_planes) trades recall for the shuffle fan-in.

Arithmetic note: dot products and norms are computed in exact DECIMAL
(float32 → double is exact; double → DECIMAL(18,9) rounds identically
in Spark and DuckDB), so results are bit-stable for the oracle. The
final cosine is a double. At production scale you'd use the plain
double path (fp error is irrelevant for ANN); the decimal path costs
~2× and exists for verifiability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .lits import dlit

DOT_SCALE = 1.0e18  # _dot_dec returns the true dot product × this


def _dot_dec(a, b):
    """Exact dot product with both inputs quantized to the 1e-9 grid
    via ``floor(v·1e9 + 0.5)`` — the SAME IEEE double ops in Spark and
    DuckDB. A double→DECIMAL cast here would silently diverge the
    engines: Spark rounds HALF_UP, DuckDB half-to-EVEN, and float32
    values DO land exactly on half boundaries (0.1494140625 bit the
    sf0.1 sweep). Quantized components multiply and sum as exact
    DECIMAL(38,0) integers, so the result is the true dot product
    scaled by ``DOT_SCALE`` (1e18). Every cosine consumer divides
    dot by √(n2·n2) — the scale cancels exactly, so ratio call sites
    are unchanged; consumers surfacing a RAW dot/norm divide by
    DOT_SCALE (or 1e9 after sqrt)."""
    def q(x):
        return F.floor(
            x.cast("double") * F.lit(1000000000.0) + F.lit(0.5)
        ).cast("decimal(19,0)")

    prods = F.zip_with(a, b, lambda x, y: q(x) * q(y))
    acc_t = "decimal(38,0)"
    return F.aggregate(
        prods,
        F.lit(0).cast(acc_t),
        lambda acc, v: (acc + v.cast(acc_t)).cast(acc_t),
    )


def with_norm2(df: DataFrame, vec_col: str = "embedding", out: str = "n2"):
    return df.withColumn(out, _dot_dec(F.col(vec_col), F.col(vec_col)))


def _dot_dbl(a, b):
    """Double-arithmetic dot product — half the cost of the decimal fold
    (measured at sf0.1). FP addition order is fixed by the fold, so the
    result is run-deterministic, but the last ULP can differ from the
    decimal-exact oracle path — use for production ranking, not for
    oracle-compared queries."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    arith: str = "decimal",
) -> DataFrame:
    """Exact cosine top-k for each query vector.

    Output: (query_id, cand_id, cosine, rank). Queries broadcast; the
    per-group top-k is a hash-partitioned window on query_id.
    ``arith='decimal'`` keeps the dot product bit-identical to the
    DuckDB oracle; ``'double'`` is the cheaper production path.
    """
    dot = _dot_dec if arith == "decimal" else _dot_dbl
    nrm = (lambda df, v, o: df.withColumn(o, dot(F.col(v), F.col(v))))
    q = F.broadcast(
        nrm(queries, vec_col, "qn2").select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qvec"),
            "qn2",
        )
    )
    c = nrm(corpus, vec_col, "cn2").select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cvec"), "cn2"
    )
    scored = (
        c.join(q, F.col("cand_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            # Rounded to 9 decimals: decimal->double conversion differs by
            # 1 ULP between engines (DuckDB double-rounds via int128);
            # ranking on the rounded value + id tiebreak is engine-stable.
            F.round(
                dot(F.col("qvec"), F.col("cvec")).cast("double")
                / (
                    F.sqrt(F.col("qn2").cast("double"))
                    * F.sqrt(F.col("cn2").cast("double"))
                ),
                9,
            ),
        )
        .select("query_id", "cand_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def blocked_pairs_cosine(
    df: DataFrame,
    block_col: str,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    arith: str = "decimal",
) -> DataFrame:
    """All-pairs cosine ≥ threshold, restricted to pairs sharing a block
    key (label, LSH bucket, …) — the scalable all-pairs pattern: the
    equi-join on the block key keeps the cross product partition-local.
    Output: (id_a, id_b, cosine), id_a < id_b. ``arith='double'`` is the
    ~2× cheaper production path (same plan; last-ULP drift only matters
    for pairs sitting exactly on the threshold).
    """
    dot = _dot_dec if arith == "decimal" else _dot_dbl
    base = df.withColumn("n2", dot(F.col(vec_col), F.col(vec_col)))
    a = base.select(
        F.col(id_col).alias("id_a"),
        F.col(block_col).alias("_blk"),
        F.col(vec_col).alias("va"),
        F.col("n2").alias("na"),
    )
    b = base.select(
        F.col(id_col).alias("id_b"),
        F.col(block_col).alias("_blk"),
        F.col(vec_col).alias("vb"),
        F.col("n2").alias("nb"),
    )
    pairs = a.join(b, "_blk").filter(F.col("id_a") < F.col("id_b"))
    if arith == "decimal":
        # Two-phase: screen every pair with plain double arithmetic
        # (codegen'd, ~10x cheaper than the interpreted decimal fold),
        # keeping a 1e-6 margin below the threshold; compute the exact
        # decimal cosine only on the survivors. Double-vs-decimal drift
        # is ~1e-15 relative, so no true pair can fall under the margin
        # — the OUTPUT values are identical to the all-decimal plan
        # (measured ~4x end-to-end at sf0.1 on label-blocked pairs).
        screen = _dot_dbl(F.col("va"), F.col("vb")) / (
            F.sqrt(_dot_dbl(F.col("va"), F.col("va")))
            * F.sqrt(_dot_dbl(F.col("vb"), F.col("vb")))
        )
        pairs = pairs.filter(screen >= threshold - 1e-6)
    return (
        pairs.withColumn(
            "cosine",
            F.round(
                dot(F.col("va"), F.col("vb")).cast("double")
                / (F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double"))),
                9,
            ),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def random_hyperplane_buckets(
    df: DataFrame,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    vec_col: str = "embedding",
    n_tables: int = 1,
    n_probes: int = 1,
) -> DataFrame:
    """SimHash-style LSH bucket ids: sign bits against ``n_planes``
    pseudo-random hyperplanes, repeated over ``n_tables`` independent
    plane sets (multi-table LSH — the standard recall lever: a true
    neighbor split apart by one table's planes usually shares a bucket
    in another; union of tables' candidates → recall ≈ 1-(1-r)^L).

    ``n_probes`` > 1 enables query-directed MULTI-PROBE (Lv et al.,
    VLDB'07): per table, also emit the buckets reached by the
    ``n_probes - 1`` CHEAPEST flip sets, where a flip set's cost is
    the summed |dot| of the planes it flips — the sign bits a true
    neighbor is most likely to differ on are exactly the low-|dot|
    ones, and ranking whole sets by total cost probes e.g. the single
    flip of the 4th-least-confident plane before the triple flip of
    the three least-confident (which a fixed bit-subset order would
    invert). Intended for the QUERY
    side only: the corpus index keeps one exact bucket per table, so
    probing multiplies the (tiny, broadcast) query fan-out, never the
    corpus explode — recall bought without growing the index.

    Planes are derived deterministically from (seed, table, plane,
    component); generated as literal array columns so the whole
    computation — dots, sign bits, confidence sort, probe flips —
    stays in codegen, no UDF and no driver numpy shipping.
    Output adds ``bucket`` (table 0's exact id, back-compat) and
    ``buckets`` (array of table-tagged ids: ``table * 2^n_planes +
    raw``, so ids from different tables can never equi-match;
    n_tables × n_probes entries, exact bucket first per table).
    """
    import random

    if not 1 <= n_probes <= (1 << n_planes):
        raise ValueError(f"n_probes must be in [1, 2^n_planes], got {n_probes}")
    n_flip_bits = max(n_probes - 1, 0).bit_length()  # ⌈log2(n_probes)⌉
    vec = F.col(vec_col)
    table_arrays = []
    for t in range(n_tables):
        rnd = random.Random(seed + 7919 * t)
        planes = [
            [rnd.uniform(-1.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
        ]
        dots = []
        for plane in planes:
            plane_col = dlit(plane)
            dots.append(
                F.aggregate(
                    F.zip_with(vec, plane_col, lambda x, y: x.cast("double") * y),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                )
            )
        raw = F.lit(0)
        for p_idx, dot in enumerate(dots):
            raw = raw + F.when(dot >= 0, F.lit(1 << p_idx)).otherwise(F.lit(0))
        tag = F.lit(t * (1 << n_planes))
        exact = F.array(tag + raw)
        if n_probes == 1:
            table_arrays.append(exact)
            continue
        # Confidence order: struct array sorts by (|dot|, plane idx)
        # — conf[j] is the j-th least-confident plane. Ties break on
        # the index, so the probe set is fully deterministic.
        conf = F.array_sort(
            F.array(
                *[
                    F.struct(F.abs(d).alias("a"), F.lit(i).alias("i"))
                    for i, d in enumerate(dots)
                ]
            )
        )
        pow2 = F.array(*[F.lit(1 << i) for i in range(n_planes)])
        # Success-likelihood probe order (Lv et al. VLDB'07, code
        # review r11 — the earlier binary-mask order probed e.g. the
        # triple-flip {b0,b1,b2} before the single {b3}): enumerate
        # every non-empty flip SET over a pool of the `pool`
        # least-confident planes, score it by the summed |dot| of the
        # flipped planes (the perturbation cost — a true neighbor most
        # likely differs on the cheapest set), sort, take the
        # n_probes-1 cheapest. pool ≥ log2(n_probes) guarantees enough
        # candidates; pool = n_planes (≤ 12 → at most 4095 sets) makes
        # the order EXACT; above that the pool is a documented
        # approximation (a set flipping a beyond-pool plane is ignored
        # even when its cost would rank). Cost ties break on the flip
        # mask → deterministic. The pool deliberately does NOT track
        # n_probes below 4096 (code review r11): a pool that grows
        # with the probe count would re-rank the candidate universe at
        # pool boundaries, so the probe set at n+1 probes would not
        # contain the set at n — breaking the "more probes never drop
        # recall" dial contract (pinned by the monotonicity tests).
        # Fixed pool ⟹ probe sets are prefixes of one ranked list ⟹
        # monotone for every n_probes ≤ 2^pool; beyond 4096 probes per
        # table (effectively a scan) the pool must grow and the
        # guarantee is per-pool-size only.
        #
        # Expression-size discipline: the enumeration is a TRANSFORM
        # over a literal mask array with `conf` referenced from inside
        # the lambdas — conf's (large: n_planes × dim literal dots)
        # tree appears ~3× per table. A first cut expanded the 2^pool-1
        # (cost, flip) structs as plain Python-built expressions, each
        # inlining conf — Catalyst spent 13 MINUTES on the resulting
        # tree at the registry setting (4 tables × 63 sets × ~12 conf
        # references each). HOFs fall out of whole-stage codegen, but
        # this runs on the probing side only (broadcast-sized queries).
        pool = min(n_planes, max(12, n_flip_bits))
        masks = F.array(*[F.lit(m) for m in range(1, 1 << pool)])
        pool_idx = F.array(*[F.lit(j) for j in range(pool)])
        pow2pool = F.array(*[F.lit(1 << j) for j in range(pool)])

        def _bit(m, j):
            # bit j of mask m, as a boolean (shiftright needs a Python
            # int operand, so test via AND against the 2^j literal)
            return m.bitwiseAND(F.element_at(pow2pool, j + 1)) != F.lit(0)

        cands = F.transform(
            masks,
            lambda m: F.struct(
                F.aggregate(
                    pool_idx,
                    F.lit(0.0),
                    lambda acc, j: acc
                    + F.when(
                        _bit(m, j), F.element_at(conf, j + 1).getField("a")
                    ).otherwise(F.lit(0.0)),
                ).alias("c"),
                F.aggregate(
                    pool_idx,
                    F.lit(0),
                    lambda acc, j: acc
                    + F.when(
                        _bit(m, j),
                        F.element_at(
                            pow2,
                            F.element_at(conf, j + 1).getField("i") + 1,
                        ),
                    ).otherwise(F.lit(0)),  # distinct powers: + == OR
                ).alias("m"),
            ),
        )
        probes = F.slice(F.array_sort(cands), 1, n_probes - 1)
        table_arrays.append(
            F.concat(
                exact,
                F.transform(
                    probes, lambda s: tag + raw.bitwiseXOR(s.getField("m"))
                ),
            )
        )
    buckets = (
        F.concat(*table_arrays) if len(table_arrays) > 1 else table_arrays[0]
    )
    return df.withColumn("buckets", buckets).withColumn(
        "bucket", F.element_at("buckets", 1)
    )


def ivf_assign(
    df: DataFrame,
    n_cells: int = 16,
    sample_fraction: float = 0.2,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """IVF coarse quantizer: KMeans centroids (trained on a sample) and
    nearest-centroid cell assignment for every vector.

    Scale shape: training touches only the sample; assignment is a
    narrow map against the broadcast centroid array (n_cells × dim
    doubles — trivially broadcastable at any corpus size). Returns
    (assigned_df_with_cell, centroids_list).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = (
        df.sample(fraction=sample_fraction, seed=seed)
        .select(array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"))
    )
    model = KMeans(k=n_cells, seed=seed, maxIter=10).fit(train)
    centroids = [list(map(float, c)) for c in model.clusterCenters()]

    # Nearest centroid via argmin over a literal centroid array — stays
    # in codegen: distance² = Σ(x-c)², computed per centroid and reduced.
    vec = F.col(vec_col)
    best_cell, best_dist = None, None
    for i, c in enumerate(centroids):
        cc = dlit(c)
        d = F.aggregate(
            F.zip_with(vec, cc, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        if best_dist is None:
            best_cell, best_dist = F.lit(i), d
        else:
            best_cell = F.when(d < best_dist, F.lit(i)).otherwise(best_cell)
            best_dist = F.least(d, best_dist)
    return df.withColumn("cell", best_cell), centroids


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF approximate top-k: corpus sharded into KMeans cells; each
    query probes its ``n_probe`` nearest cells only.

    The inverted-file structure is the partitioning itself: repartition
    the corpus by cell and the probe join is partition-local. Recall
    rises with n_probe (n_probe == n_cells ≡ brute force).
    """
    assigned, centroids = ivf_assign(corpus, n_cells, seed=seed, vec_col=vec_col)

    # Query → its n_probe nearest centroids (same codegen argmin trick,
    # ranked via a posexplode over the distance array).
    qvec = F.col(vec_col)
    dists = F.array(
        *[
            F.aggregate(
                F.zip_with(
                    qvec,
                    dlit(c),
                    lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            for c in centroids
        ]
    )
    q_cells = (
        queries.withColumn("_d", dists)
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qvec"),
            F.posexplode("_d").alias("cell", "dist"),
        )
        .withColumn(
            "_rk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy("dist", "cell")
            ),
        )
        .filter(F.col("_rk") <= n_probe)
        .select("query_id", "qvec", "cell")
    )
    q = F.broadcast(
        with_norm2(q_cells.withColumnRenamed("qvec", vec_col), vec_col, "qn2")
        .withColumnRenamed(vec_col, "qvec")
    )
    c = with_norm2(assigned, vec_col, "cn2").select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cvec"), "cn2", "cell"
    )
    scored = (
        c.join(q, "cell")
        .filter(F.col("cand_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(
                _dot_dec(F.col("qvec"), F.col("cvec")).cast("double")
                / (F.sqrt(F.col("qn2").cast("double")) * F.sqrt(F.col("cn2").cast("double"))),
                9,
            ),
        )
        .select("query_id", "cand_id", "cosine")
        .distinct()  # a candidate may appear via several probed cells
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_tables: int = 1,
    n_probes: int = 1,
) -> DataFrame:
    """Approximate top-k: only candidates sharing an LSH bucket with the
    query — in ANY of ``n_tables`` independent tables, against ANY of
    the query's ``n_probes`` probed buckets per table — are scored.
    Recall < 1 by construction (scale path; brute_force_topk is the
    exactness baseline). Two recall levers with different costs:
    ``n_tables`` multiplies the CORPUS index explode (index-size cost);
    ``n_probes`` (query-directed multi-probe — flip subsets of the
    least-confident sign bits) multiplies only the broadcast QUERY
    fan-out, so at 100 TB it is the cheap lever: the corpus side keeps
    one exact bucket row per table regardless of probe count.

    Plan shape: slim corpus (id, table-tagged bucket) rows explode
    ×n_tables and equi-join the ×(n_tables·n_probes) exploded broadcast
    query buckets; candidate pairs dedup BEFORE any vector is gathered;
    then one join pulls candidate vectors for scoring — vectors never
    ride through the candidate-generation join.
    """
    cb = random_hyperplane_buckets(corpus, n_planes, dim, seed, vec_col, n_tables)
    qb = random_hyperplane_buckets(
        queries, n_planes, dim, seed, vec_col, n_tables, n_probes
    )
    c_slim = cb.select(
        F.col(id_col).alias("cand_id"), F.explode("buckets").alias("tb")
    )
    q_slim = F.broadcast(
        qb.select(F.col(id_col).alias("query_id"), F.explode("buckets").alias("tb"))
    )
    pairs = (
        c_slim.join(q_slim, "tb")
        .filter(F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id")
        .distinct()
    )
    q = F.broadcast(
        with_norm2(queries, vec_col, "qn2").select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qvec"),
            "qn2",
        )
    )
    c = with_norm2(corpus, vec_col, "cn2").select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cvec"), "cn2"
    )
    scored = (
        pairs.join(c, "cand_id")
        .join(q, "query_id")
        .withColumn(
            "cosine",
            F.round(
                _dot_dec(F.col("qvec"), F.col("cvec")).cast("double")
                / (F.sqrt(F.col("qn2").cast("double")) * F.sqrt(F.col("cn2").cast("double"))),
                9,
            ),
        )
        .select("query_id", "cand_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def semantic_dedup(
    df: DataFrame,
    block_col: str,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    arith: str = "decimal",
) -> DataFrame:
    """SemDeDup-style semantic pruning: within each block (a cluster
    assignment — the driver tables' ``label``, or ``ivf_assign``'s
    KMeans cells at scale), drop every vector whose cosine similarity to
    a LOWER-ID block member is ≥ ``threshold``; the lowest id of each
    near-dup neighborhood survives as the canonical representative.

    This is the one-shot greedy prune of the SemDeDup recipe (not
    connected components — a kept vector may transitively link two
    pruned neighborhoods; the greedy pass is the published trade-off).
    Plan: blocked all-pairs (cross product stays partition-local to the
    block) → distinct doomed ids → broadcast-able left_anti join back
    to the corpus. No driver materialization anywhere.
    """
    pairs = blocked_pairs_cosine(df, block_col, threshold, vec_col, id_col, arith)
    doomed = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(doomed, id_col, "left_anti")


def quantize_int8(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = max|x| / 127,
    q[i] = round(x[i] / scale) ∈ [-127, 127].

    The 100 TB memory lever for ANN: a 4× smaller corpus footprint
    (int8 vs float32) and integer dot products, at a recall cost pinned
    by tests. Pure map (array lambdas, JVM-side); zero-vectors keep
    scale 0 and quantize to zeros. Output: (id, qvec tinyint[], scale).
    """
    mx = F.array_max(F.transform(F.col(vec_col), lambda x: F.abs(x.cast("double"))))
    scale = (mx / F.lit(127.0)).alias("scale")
    qvec = F.when(mx == 0.0, F.transform(F.col(vec_col), lambda x: F.lit(0).cast("tinyint"))).otherwise(
        F.transform(
            F.col(vec_col),
            lambda x: F.round(x.cast("double") / (mx / F.lit(127.0))).cast("tinyint"),
        )
    )
    return df.select(F.col(id_col), qvec.alias("qvec"), scale)


def int8_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate cosine top-k over int8-quantized vectors.

    Integer dot products accumulate exactly in longs (no FP drift);
    approx_cosine = (dot_q · scale_q · scale_c) / (|q̂| · |ĉ|) where the
    norms are the dequantized vector norms. Same broadcast + windowed
    top-k shape as ``brute_force_topk``; rows-only correctness (the
    quantization error is the point — recall vs the exact path is
    pinned in tests, not hashes).
    """
    qz_c = quantize_int8(corpus, vec_col, id_col)
    qz_q = quantize_int8(queries, vec_col, id_col)

    def _int_dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x.cast("long") * y.cast("long")),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )

    c = qz_c.select(
        F.col(id_col).alias("cand_id"),
        F.col("qvec").alias("cvec"),
        F.col("scale").alias("c_scale"),
        F.sqrt(_int_dot(F.col("qvec"), F.col("qvec")).cast("double")).alias("c_norm"),
    )
    q = F.broadcast(
        qz_q.select(
            F.col(id_col).alias("query_id"),
            F.col("qvec"),
            F.col("scale").alias("q_scale"),
            F.sqrt(_int_dot(F.col("qvec"), F.col("qvec")).cast("double")).alias(
                "q_norm"
            ),
        )
    )
    scored = (
        c.join(q, F.col("cand_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.when(
                (F.col("c_norm") == 0.0) | (F.col("q_norm") == 0.0), F.lit(0.0)
            ).otherwise(
                _int_dot(F.col("qvec"), F.col("cvec")).cast("double")
                / (F.col("q_norm") * F.col("c_norm"))
            ),
        )
        .select("query_id", "cand_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
