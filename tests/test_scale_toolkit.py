"""Scale-toolkit tests: salting correctness, bucketed shuffle-free
joins (plan-asserted), partitioned layout pruning (plan-asserted)."""

import os
import tempfile

from pyspark.sql import functions as F

from hive_population_ml_spark.io import Tables
from hive_population_ml_spark.operators.skew import (
    bucketed_table,
    salted_join,
    write_partitioned,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_salted_join_equals_plain_join(spark, sf_dir):
    t = Tables(spark, sf_dir)
    big = t.orders.select("o_orderkey", "o_custkey")
    small = t.customer.select(F.col("c_custkey").alias("o_custkey"), "c_mktsegment")
    plain = big.join(small, "o_custkey").count()
    salted = salted_join(big, small, "o_custkey", n_salts=8).count()
    assert plain == salted


def test_salted_join_spreads_hot_key(spark):
    # one pathological key carrying 10k rows + a small dim
    big = spark.range(10000).select(F.lit(1).alias("k"), F.col("id"))
    small = spark.createDataFrame([(1, "hot")], "k int, v string")
    out = salted_join(big, small, "k", n_salts=8)
    assert out.count() == 10000
    # salts really took >1 distinct value pre-drop (spread happened)
    salted_big = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(8))
    )
    assert salted_big.select("_salt").distinct().count() == 8


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    t = Tables(spark, sf_dir)
    with tempfile.TemporaryDirectory() as d:
        a = bucketed_table(
            spark,
            t.orders.select("o_orderkey", "o_custkey", "o_totalprice"),
            "b_orders",
            "o_custkey",
            n_buckets=4,
            path=os.path.join(d, "b_orders"),
        )
        b = bucketed_table(
            spark,
            t.customer.select("c_custkey", "c_acctbal"),
            "b_customer",
            "c_custkey",
            n_buckets=4,
            path=os.path.join(d, "b_customer"),
        )
        # disable auto-broadcast so the planner must pick SMJ — at real
        # scale neither side broadcasts; that is the case bucketing serves.
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = a.join(b, a.o_custkey == b.c_custkey)
            assert j.count() > 0
            plan = _plan(j)
            assert "ShuffleExchange" not in plan.replace(
                "Exchange hashpartitioning", "ShuffleExchange"
            ), f"bucketed join still shuffles:\n{plan}"
            assert "SortMergeJoin" in plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
            spark.sql("DROP TABLE IF EXISTS b_orders")
            spark.sql("DROP TABLE IF EXISTS b_customer")


def test_partitioned_write_prunes(spark, sf_dir):
    t = Tables(spark, sf_dir)
    ev = t.events.withColumn("day", F.to_date("ts"))
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "events_by_day")
        write_partitioned(ev, p, ["day"], sort_within=["user_id", "ts"])
        back = spark.read.parquet(p)
        one_day = back.select(F.min("day")).first()[0]
        q = back.filter(F.col("day") == F.lit(one_day))
        n = q.count()
        assert n > 0
        n_days = back.select("day").distinct().count()
        assert n_days > 1
        # pruning pushed to the scan: the day predicate appears as a
        # PartitionFilter (directory-level skip), not a data filter.
        plan = _plan(q)
        assert "PartitionFilters: [isnotnull(day" in plan, plan
        assert f"day#" in plan.split("PartitionFilters")[1].split("]")[0]
        # functional check: the single day directory holds exactly the
        # rows the pruned query returns.
        direct = spark.read.parquet(os.path.join(p, f"day={one_day}"))
        assert direct.count() == n


def test_sampling_and_pii_are_shuffle_free(spark, sf_dir):
    """stratified_sample and pii_mask must stay pure map passes — at
    100 TB they run as zero-shuffle scans; any Exchange is a defect."""
    from hive_population_ml_spark.operators.sampling import stratified_sample
    from hive_population_ml_spark.operators.textops import pii_mask

    docs = Tables(spark, sf_dir).documents
    sampled = stratified_sample(docs, "lang", {"en": 0.5}, id_col="doc_id")
    assert "Exchange" not in _plan(sampled), _plan(sampled)
    masked = docs.select("doc_id", pii_mask("text").alias("t"))
    assert "Exchange" not in _plan(masked), _plan(masked)


def test_pack_shards_no_global_sort(spark, sf_dir):
    """Shard packing windows partition by the bucket column: the plan
    must contain NO global (non-partitioned) Sort — parallelism is
    #buckets, never a single-task total order."""
    from hive_population_ml_spark.operators import textops
    from hive_population_ml_spark.operators.sampling import pack_shards

    docs = Tables(spark, sf_dir).documents
    m = pack_shards(docs, "lang", textops.token_count("text"), 2000, "doc_id")
    plan = _plan(m)
    for line in plan.splitlines():
        if "Sort " in line and "SortAggregate" not in line:
            assert "bucket" in line or "lang" in line, f"global sort:\n{line}"
    assert "Exchange SinglePartition" not in plan.replace(
        "Exchange SinglePartition, EXECUTOR_BROADCAST", ""
    ), plan


# -- Z-order layout -----------------------------------------------------------


def _py_morton(vals, bits, n):
    z = 0
    for i in range(bits):
        for j, v in enumerate(vals):
            z |= ((v >> i) & 1) << (i * n + j)
    return z


def test_zorder_key_matches_python_reference(spark):
    from hive_population_ml_spark.operators.skew import zorder_key

    import random

    rnd = random.Random(7)
    data = [(rnd.randrange(0, 256), rnd.randrange(0, 256)) for _ in range(200)]
    df = spark.createDataFrame(data, "x long, y long")
    # bounds (0,255) + bits=8 make the scaling the identity on ints
    out = df.withColumn(
        "z",
        zorder_key(df, ["x", "y"], bits=8, bounds={"x": (0, 255), "y": (0, 255)}),
    ).collect()
    for r in out:
        assert r["z"] == _py_morton((r["x"], r["y"]), 8, 2), (r["x"], r["y"])


def test_zorder_key_validates_args(spark):
    import pytest as _pytest

    from hive_population_ml_spark.operators.skew import zorder_key

    df = spark.createDataFrame([(1, 2)], "x long, y long")
    with _pytest.raises(ValueError):
        zorder_key(df, [])
    with _pytest.raises(ValueError):
        zorder_key(df, ["x", "y"], bits=32)


def test_write_zordered_tightens_both_dims(spark, tmp_path):
    """On a uniform 2-D grid, z-ordered files have SMALL min/max
    envelopes in BOTH dimensions, while a single-column sort leaves the
    second dimension's per-file envelope spanning the full range — the
    property parquet row-group pruning feeds on."""
    import glob

    import pyarrow.parquet as pq

    from hive_population_ml_spark.operators.skew import write_zordered

    grid = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(grid, "x long, y long")

    zdir, sdir = str(tmp_path / "z"), str(tmp_path / "s")
    write_zordered(df, zdir, ["x", "y"], n_files=16)
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(sdir)

    def avg_file_span(path, col):
        spans = []
        for f in glob.glob(f"{path}/*.parquet"):
            t = pq.read_table(f, columns=[col])[col].to_pylist()
            if t:
                spans.append((max(t) - min(t)) / 63.0)
        assert len(spans) >= 8
        return sum(spans) / len(spans)

    # single-column layout: y per-file span is ~the whole domain
    assert avg_file_span(sdir, "y") > 0.9
    # z-order: BOTH dims' envelopes shrink to curve-cell size
    assert avg_file_span(zdir, "x") < 0.6
    assert avg_file_span(zdir, "y") < 0.6


def test_compact_parquet_reduces_files_and_preserves_rows(spark, tmp_path):
    from hive_population_ml_spark.operators.skew import compact_parquet

    src, dst = str(tmp_path / "frag"), str(tmp_path / "compact")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.repartition(64).write.parquet(src)  # the streaming-sink pathology

    import glob

    assert len(glob.glob(f"{src}/*.parquet")) == 64
    n = compact_parquet(spark, src, dst, target_file_mb=128)
    got_files = glob.glob(f"{dst}/*.parquet")
    assert len(got_files) == n <= 4
    back = spark.read.parquet(dst)
    assert back.count() == ev.count()
    assert sorted(back.columns) == sorted(ev.columns)


def test_compact_parquet_with_sort_tightens_envelopes(spark, tmp_path):
    import glob

    import pyarrow.parquet as pq

    from hive_population_ml_spark.operators.skew import compact_parquet

    src, dst = str(tmp_path / "frag2"), str(tmp_path / "sorted")
    import hashlib

    df = spark.createDataFrame(
        [
            (i % 97, hashlib.md5(str(i).encode()).hexdigest() * 12)
            for i in range(20000)
        ],
        "k long, pad string",
    )  # incompressible payload so the byte-size -> file-count math bites
    df.repartition(32).write.parquet(src)
    compact_parquet(spark, src, dst, target_file_mb=1, sort_by=["k"])
    files = glob.glob(f"{dst}/*.parquet")
    assert len(files) >= 2
    spans = []
    for f in files:
        ks = pq.read_table(f, columns=["k"])["k"].to_pylist()
        spans.append((max(ks) - min(ks)) / 96.0)
    # range-partitioned + sorted: each file covers a slice, not the domain
    assert sum(spans) / len(spans) < 0.7


# -- Registered 100 TB sketch variants (VERDICT r5 #5): error bounds vs
# the exact forms, reusing the GK rank-error pattern from
# tests/test_operators.py::test_quantile_sketch_rank_error_bound. -----------


def test_a_percentiles_approx_rank_error_bound(spark, sf_oracle_dir):
    """Every sketched quantile's RANK in the sorted group must sit
    within n/accuracy of the target rank (GK guarantee), and the
    variant's output schema must match the exact form (drop-in swap)."""
    import bisect

    from hive_population_ml_spark.queries import QUERIES, load_all

    load_all()
    exact = QUERIES["a_percentiles"](spark, sf_oracle_dir)
    approx = QUERIES["a_percentiles_approx"](spark, sf_oracle_dir)
    assert approx.columns == exact.columns
    got = {r["l_returnflag"]: r for r in approx.collect()}
    vals = {}
    for r in (
        Tables(spark, sf_oracle_dir)
        .lineitem.select("l_returnflag", "l_extendedprice")
        .collect()
    ):
        vals.setdefault(r["l_returnflag"], []).append(r["l_extendedprice"])
    acc = 10000
    for g, xs in vals.items():
        xs.sort()
        n = len(xs)
        for col, p in [("p25", 0.25), ("p50", 0.5), ("p75", 0.75), ("p95", 0.95)]:
            rank = bisect.bisect_left(xs, got[g][col])
            # +2: one for the discrete-rank ceiling, one because the
            # query rounds its output to 6 decimals (can shift bisect
            # by a rank among near-equal values)
            assert abs(rank - p * n) <= n / acc + 2, (g, col, rank, p * n)


def test_a_outlier_iqr_approx_close_to_exact(spark, sf_oracle_dir):
    """Sketch-quartile fences drift by at most the GK rank error, so the
    flagged fraction must stay within a tight band of the exact form's
    (same groups, same schema)."""
    from hive_population_ml_spark.queries import QUERIES, load_all

    load_all()
    exact = {
        r["event_type"]: r for r in QUERIES["a_outlier_iqr"](spark, sf_oracle_dir).collect()
    }
    approx_df = QUERIES["a_outlier_iqr_approx"](spark, sf_oracle_dir)
    approx = {r["event_type"]: r for r in approx_df.collect()}
    assert set(approx) == set(exact)
    for g, e in exact.items():
        a = approx[g]
        assert a["n"] == e["n"]
        assert abs(a["outlier_frac"] - e["outlier_frac"]) <= 0.002, (g, a, e)


def test_a_profile_table_approx_hll_error_bound(spark, sf_oracle_dir):
    """HLL++ at rsd=0.01: distinct counts within ~3*rsd of exact; every
    non-sketched metric bit-identical to the exact profile."""
    from hive_population_ml_spark.queries import QUERIES, load_all

    load_all()
    exact = {
        r["column_name"]: r
        for r in QUERIES["a_profile_table"](spark, sf_oracle_dir).collect()
    }
    approx_df = QUERIES["a_profile_table_approx"](spark, sf_oracle_dir)
    approx = {r["column_name"]: r for r in approx_df.collect()}
    assert approx_df.columns == QUERIES["a_profile_table"](
        spark, sf_oracle_dir
    ).columns
    assert set(approx) == set(exact)
    for c, e in exact.items():
        a = approx[c]
        for col in ("n", "n_null", "min_value", "max_value", "avg_value"):
            assert a[col] == e[col], (c, col)
        assert abs(a["n_distinct"] - e["n_distinct"]) <= max(
            3, 0.03 * e["n_distinct"]
        ), (c, a["n_distinct"], e["n_distinct"])


def test_cms_overestimate_only_and_bound(spark, sf_oracle_dir):
    """CMS contract on the real corpus: every estimate >= the exact
    count (one-sided), and the overshoot respects the e/width * N
    bound for the vast majority of probes (d=4 rows make a blown
    bound vanishingly unlikely; we assert all-20 here because the
    probe set is tiny and the seed fixed)."""
    import math

    from pyspark.sql import functions as F

    from hive_population_ml_spark.operators.sketches import (
        cms_estimate,
        count_min_sketch,
    )

    docs = spark.read.parquet(f"{sf_oracle_dir}/documents.parquet")
    tok = docs.select(F.explode(F.split("text", " ")).alias("t"))
    n_total = tok.count()
    exact = {
        r["t"]: r["n"]
        for r in tok.groupBy("t").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    width = 1024
    sketch = count_min_sketch(tok, "t", depth=4, width=width)
    probes = spark.createDataFrame(
        [(t,) for t in sorted(exact)[:50]] , "t string"
    )
    est = {
        r["t"]: r["est_count"]
        for r in cms_estimate(sketch, probes, "t", depth=4, width=width).collect()
    }
    bound = math.e / width * n_total
    for t, e in est.items():
        assert e >= exact[t], (t, e, exact[t])  # never undercounts
        assert e - exact[t] <= bound, (t, e, exact[t], bound)


def test_cms_shard_sketches_merge_exactly(spark, sf_oracle_dir):
    """Mergeability is EXACT: cell-wise summing the per-shard sketches
    reproduces the whole-corpus sketch bit-for-bit (counts are
    additive) — the persist-per-day, roll-up-any-range pattern."""
    from pyspark.sql import functions as F

    from hive_population_ml_spark.operators.sketches import count_min_sketch

    docs = spark.read.parquet(f"{sf_oracle_dir}/documents.parquet")
    tok = docs.select(
        (F.col("doc_id") % 2).alias("shard"),
        F.explode(F.split("text", " ")).alias("t"),
    )
    whole = {
        (r["r"], r["b"]): r["c"]
        for r in count_min_sketch(tok, "t").collect()
    }
    merged: dict = {}
    for s in (0, 1):
        part = count_min_sketch(tok.filter(F.col("shard") == s), "t")
        for r in part.collect():
            merged[(r["r"], r["b"])] = merged.get((r["r"], r["b"]), 0) + r["c"]
    assert merged == whole


def test_cms_partial_aggregates_before_exchange(spark, sf_oracle_dir):
    """The cell build must map-side combine: two HashAggregate levels
    around ONE exchange, shuffle bounded by depth*width keys."""
    from pyspark.sql import functions as F

    from hive_population_ml_spark.operators.sketches import count_min_sketch

    docs = spark.read.parquet(f"{sf_oracle_dir}/documents.parquet")
    tok = docs.select(F.explode(F.split("text", " ")).alias("t"))
    plan = (
        count_min_sketch(tok, "t")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan[:2000]
    assert plan.count("HashAggregate") == 2, plan[:2000]


def test_source_overlap_sketch_error_envelope(spark, sf_oracle_dir):
    """HLL inclusion–exclusion overlap matrix vs the exact form: same
    pair set; per-source set sizes within 2% (HLL relative error at
    lg_k=14 is ~0.8%); intersections within 4 sigma of the UNION size
    (the inclusion–exclusion error model the docstring documents);
    jaccard/containment consistent with the estimated counts."""
    from hive_population_ml_spark.io import Tables
    from hive_population_ml_spark.operators.dedup import (
        source_overlap,
        source_overlap_sketch,
    )

    docs = Tables(spark, sf_oracle_dir).documents
    exact = {
        (r["g1"], r["g2"]): r for r in source_overlap(docs).collect()
    }
    sk = {
        (r["g1"], r["g2"]): r
        for r in source_overlap_sketch(docs, lg_k=14).collect()
    }
    # the sketch reports the FULL pair matrix (disjoint pairs included,
    # inter ~ 0); the exact form omits pairs with no shared shingle
    n_groups = docs.select("source").distinct().count()
    assert len(sk) == n_groups * (n_groups - 1) // 2
    assert set(exact) <= set(sk) and len(exact) > 0
    rel = 1.04 / (2 ** (14 / 2))  # ~0.8% HLL standard error
    for key, e in exact.items():
        s = sk[key]
        assert abs(s["n1"] - e["n1"]) <= max(3, 0.02 * e["n1"])
        assert abs(s["n2"] - e["n2"]) <= max(3, 0.02 * e["n2"])
        union = e["n1"] + e["n2"] - e["inter"]
        tol = 4 * rel * union + 3
        assert abs(s["inter"] - e["inter"]) <= tol, (key, s["inter"], e["inter"], tol)
        assert 0 <= s["inter"] <= min(s["n1"], s["n2"])  # containment <= 1.0
        denom = s["n1"] + s["n2"] - s["inter"]
        assert abs(s["jaccard"] - s["inter"] / denom) < 1e-6
        assert abs(s["containment"] - s["inter"] / min(s["n1"], s["n2"])) < 1e-6
        assert 0.0 <= s["containment"] <= 1.0


def test_cms_join_size_overestimates_within_bound(spark, sf_oracle_dir):
    """CMS inner-product join-size estimate: est >= true self-join size
    (sum of per-key count squares) and est <= true + (e/width)*Na*Nb —
    the Cormode-Muthukrishnan inner-product guarantee; plus a two-table
    FK case where the true join size is known exactly."""
    import math

    from hive_population_ml_spark.io import Tables
    from hive_population_ml_spark.operators.sketches import (
        cms_join_size,
        count_min_sketch,
    )

    t = Tables(spark, sf_oracle_dir)
    ev = t.events.select(F.col("user_id").cast("string").alias("k"))
    n = ev.count()
    true = (
        t.events.groupBy("user_id")
        .count()
        .agg(F.sum(F.col("count") * F.col("count")).alias("s"))
        .collect()[0]["s"]
    )
    sk = count_min_sketch(ev, "k", depth=4, width=8192)
    est = cms_join_size(sk, sk).collect()[0]["est_join_rows"]
    assert est >= true
    assert est <= true + math.e / 8192 * n * n

    # FK join: orders ⋈ customer on custkey — true size = |orders|
    o = t.orders.select(F.col("o_custkey").cast("string").alias("k"))
    c = t.customer.select(F.col("c_custkey").cast("string").alias("k"))
    sko = count_min_sketch(o, "k", depth=4, width=8192)
    skc = count_min_sketch(c, "k", depth=4, width=8192)
    est_fk = cms_join_size(sko, skc).collect()[0]["est_join_rows"]
    n_orders, n_cust = o.count(), c.count()
    assert est_fk >= n_orders
    assert est_fk <= n_orders + math.e / 8192 * n_orders * n_cust

    # disjoint key sets: true join size 0 -> estimate must be 0, not
    # NULL/inflated (a depth row with no shared cells has true inner
    # product 0 and must survive into the min)
    d1 = spark.createDataFrame([(f"a{i}",) for i in range(50)], "k string")
    d2 = spark.createDataFrame([(f"b{i}",) for i in range(50)], "k string")
    est_disjoint = cms_join_size(
        count_min_sketch(d1, "k", depth=4, width=8192),
        count_min_sketch(d2, "k", depth=4, width=8192),
    ).collect()[0]["est_join_rows"]
    assert est_disjoint == 0.0


def test_a_quantile_bins_approx_mass_and_edge_bounds(spark, sf_oracle_dir):
    """The sketch-edge decile twin (VERDICT r8 #4) must be a drop-in
    swap for a_quantile_bins: same schema, same groups, every decile's
    mass within 2*n/accuracy of the exact n/10 equi-depth target, and
    per-(group, decile) [lo, hi] ranges consistent with a partition of
    the value axis (lo <= hi, adjacent bins non-overlapping)."""
    from hive_population_ml_spark.queries import QUERIES, load_all

    load_all()
    exact = QUERIES["a_quantile_bins"](spark, sf_oracle_dir)
    approx = QUERIES["a_quantile_bins_approx"](spark, sf_oracle_dir)
    assert approx.columns == exact.columns
    rows = approx.collect()
    assert rows
    by_group: dict = {}
    for r in rows:
        by_group.setdefault(r["event_type"], []).append(r)
    for g, bins in by_group.items():
        bins.sort(key=lambda r: r["decile"])
        n = sum(r["n"] for r in bins)
        # GK rank error accuracy=10000: each edge off by <= n/10000
        # rows, so each bin's mass is within 2*n/10000 of n/10 (plus
        # tie mass at the edge value; tolerance doubled for safety)
        tol = max(4 * n / 10000.0, 2.0)
        for r in bins:
            assert abs(r["n"] - n / 10.0) <= max(tol, 0.02 * n), (
                g, r["decile"], r["n"], n,
            )
        for a, b in zip(bins, bins[1:]):
            assert a["lo"] <= a["hi"]
            assert a["hi"] <= b["lo"] or abs(a["hi"] - b["lo"]) < 1e-9, (
                "adjacent deciles overlap", g, a, b,
            )


def test_a_rank_normalize_approx_error_bound(spark, sf_oracle_dir):
    """The GK-cell twin (VERDICT r9 #6) must be a drop-in swap for
    a_rank_normalize: same schema, same row count, and per-row
    |pct_approx - pct_exact| within the cell-midpoint bound — half a
    cell (1/512) + GK rank error (n/10000) + the row's within-cell tie
    mass. The testdata has negligible value ties, so a flat envelope of
    1/512 + 2e-4 + slack covers it; the join also pins that every
    (event_type, event_id) key survives with its exact value."""
    from hive_population_ml_spark.queries import QUERIES, load_all

    load_all()
    exact = QUERIES["a_rank_normalize"](spark, sf_oracle_dir)
    approx = QUERIES["a_rank_normalize_approx"](spark, sf_oracle_dir)
    assert approx.columns == exact.columns
    j = (
        exact.alias("e")
        .join(
            approx.alias("a"),
            ["event_type", "event_id"],
            "full_outer",
        )
        .selectExpr(
            "event_type",
            "event_id",
            "e.value as ve",
            "a.value as va",
            "abs(a.pct_rank - e.pct_rank) as err",
        )
        .collect()
    )
    assert j
    assert all(r["ve"] is not None and r["va"] is not None for r in j)
    assert all(abs(r["ve"] - r["va"]) < 1e-9 for r in j)
    envelope = 1.0 / 512 + 2e-4 + 2e-3  # half-cell + GK + tie slack
    worst = max(r["err"] for r in j)
    assert worst <= envelope, worst


def test_a_gini_value_approx_close_to_exact(spark, sf_oracle_dir):
    """Trapezoid-on-GK-bins Gini must sit within the binning bound of
    the exact rank-form value: the approximation drops only within-bin
    inequality, so |G_exact - G_approx| <= max bin mass share (~1/64
    at equi-depth; 3/64 allowed for sketch edge error), and the
    trapezoid can only UNDERestimate."""
    from hive_population_ml_spark.queries import QUERIES, load_all

    load_all()
    exact = {
        r["event_type"]: r
        for r in QUERIES["a_gini_value"](spark, sf_oracle_dir).collect()
    }
    approx = QUERIES["a_gini_value_approx"](spark, sf_oracle_dir)
    assert approx.columns == ["event_type", "n", "total_value", "gini"]
    rows = approx.collect()
    assert len(rows) == len(exact)
    for r in rows:
        e = exact[r["event_type"]]
        assert r["n"] == e["n"]
        assert abs(r["total_value"] - e["total_value"]) < 1e-6 * max(
            1.0, abs(e["total_value"])
        )
        assert e["gini"] - r["gini"] >= -3.0 / 64, (r, e)
        assert abs(r["gini"] - e["gini"]) <= 3.0 / 64, (r, e)


def test_a_mann_whitney_binned_within_midrank_bound(spark, sf_oracle_dir):
    """Binned U is the exact midrank U of the coarsened values; each
    observation's midrank moves < t_bin/2, so |U_binned - U_exact| <=
    sum_i a_i*(t_i-1)/2 computed from the bin occupancies. Also: same
    (n_a, n_b) and the z sign agrees when |z| is non-marginal."""
    from pyspark.sql import functions as F

    from hive_population_ml_spark.io import Tables
    from hive_population_ml_spark.operators.sampling import uniform_hash
    from hive_population_ml_spark.queries import QUERIES, load_all

    load_all()
    exact = {
        r["event_type"]: r
        for r in QUERIES["a_mann_whitney_u"](spark, sf_oracle_dir).collect()
    }
    approx_df = QUERIES["a_mann_whitney_binned"](spark, sf_oracle_dir)
    assert approx_df.columns == ["event_type", "n_a", "n_b", "u_a", "z"]
    approx = {r["event_type"]: r for r in approx_df.collect()}
    assert set(approx) == set(exact)
    # recompute the per-group displacement bound from the bin grid
    n_bins = 256
    s = (
        Tables(spark, sf_oracle_dir)
        .events.select(
            "event_type",
            "value",
            F.when(uniform_hash("user_id", mode="minstd") < 0.5, 1)
            .otherwise(0)
            .alias("is_a"),
        )
    )
    bounds = s.groupBy("event_type").agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    g = (
        s.join(F.broadcast(bounds), "event_type")
        .select(
            "event_type",
            "is_a",
            F.least(
                F.lit(n_bins - 1),
                F.floor(
                    (F.col("value") - F.col("lo"))
                    / ((F.col("hi") - F.col("lo")) / n_bins)
                ).cast("int"),
            ).alias("bin"),
        )
        .groupBy("event_type", "bin")
        .agg(F.sum("is_a").alias("a"), F.count("*").alias("t"))
        .groupBy("event_type")
        .agg(
            F.sum(F.col("a") * (F.col("t") - 1) / 2.0).alias("bound")
        )
    )
    bound = {r["event_type"]: r["bound"] for r in g.collect()}
    for k, r in approx.items():
        e = exact[k]
        assert (r["n_a"], r["n_b"]) == (e["n_a"], e["n_b"])
        assert abs(r["u_a"] - e["u_a"]) <= bound[k] + 1.0, (k, r, e, bound[k])
        if abs(e["z"]) > 0.5:
            assert (r["z"] > 0) == (e["z"] > 0), (k, r, e)


def test_a_psi_drift_approx_close_to_exact(spark, sf_oracle_dir):
    """GK-median half split vs exact ntile(2): at most n/10000 + tie
    rows flip sides, so bucket counts shift by a vanishing fraction and
    PSI (a smooth function of bucket proportions) moves by o(1). The
    envelope asserted here is loose (0.05 absolute) because PSI's ln
    ratios amplify small-count buckets under Laplace smoothing."""
    from hive_population_ml_spark.queries import QUERIES, load_all

    load_all()
    exact = {
        r["event_type"]: r
        for r in QUERIES["a_psi_drift"](spark, sf_oracle_dir).collect()
    }
    approx_df = QUERIES["a_psi_drift_approx"](spark, sf_oracle_dir)
    assert approx_df.columns == ["event_type", "n", "psi"]
    approx = {r["event_type"]: r for r in approx_df.collect()}
    assert set(approx) == set(exact)
    for k, r in approx.items():
        e = exact[k]
        assert r["n"] == e["n"]
        assert abs(r["psi"] - e["psi"]) <= 0.05, (k, r, e)
