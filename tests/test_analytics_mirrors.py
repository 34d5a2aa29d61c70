"""Python-mirror checks for the round-7 analytics primitives.

The DuckDB oracle gate proves Spark == DuckDB; these prove both equal an
INDEPENDENT plain-Python/numpy computation on the same inputs — catching
the failure mode where the Spark query and its SQL twin share the same
misreading of the algorithm.
"""

from __future__ import annotations

from etl_spark import workload_relational, workload_text
from etl_spark.io import read_table

SF_DIR = "/root/testdata/sf0.001"


def test_exact_global_rank_matches_window_ntile(spark):
    """The two-pass range-partitioned rank + closed-form ntile must equal
    the single-window ntile on data WITH heavy ties."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.range(997).select(
        F.col("id").alias("k"),
        (F.pmod(F.col("id") * 37, F.lit(25))).alias("v"),  # 25 distinct values: tie-heavy
    )
    two_pass = workload_relational._exact_global_rank(df, "v", "k", ascending=True)
    got = {
        r["k"]: r["t"]
        for r in two_pass.select(
            "k", workload_relational._ntile_from_rank(5).alias("t")
        ).collect()
    }
    w = Window.orderBy(F.col("v").asc(), F.col("k").asc())
    want = {
        r["k"]: r["t"]
        for r in df.select("k", F.ntile(5).over(w).alias("t")).collect()
    }
    assert got == want


def test_exact_global_rank_descending_and_constant(spark):
    from pyspark.sql import functions as F

    # all-equal values: span == 0 branch; rank must still be a permutation
    df = spark.range(100).select(F.col("id").alias("k"), F.lit(7.0).alias("v"))
    ranked = workload_relational._exact_global_rank(df, "v", "k", ascending=False)
    ranks = sorted(r["__rank"] for r in ranked.collect())
    assert ranks == list(range(1, 101))


def test_covariance_matches_numpy(spark):
    import numpy as np

    got = {
        (r["i"], r["j"]): r["cov"]
        for r in workload_text.embeddings_covariance(spark, SF_DIR).collect()
    }
    X = np.array(
        [
            r["embedding"]
            for r in read_table(spark, SF_DIR, "embeddings")
            .select("embedding")
            .collect()
        ],
        dtype=np.float64,
    )
    C = (X.T @ X) / len(X) - np.outer(X.mean(axis=0), X.mean(axis=0))
    d = X.shape[1]
    assert len(got) == d * (d + 1) // 2
    worst = max(abs(got[(i, j)] - C[i, j]) for i in range(d) for j in range(i, d))
    assert worst < 1e-6, worst  # 9-dp contribution rounding bounds the drift


def test_triangle_count_matches_bruteforce(spark):
    li = {
        (r["l_orderkey"], r["l_partkey"])
        for r in read_table(spark, SF_DIR, "lineitem")
        .select("l_orderkey", "l_partkey")
        .collect()
    }
    by_order: dict = {}
    for o, p in li:
        by_order.setdefault(o, set()).add(p)
    edges = set()
    for parts in by_order.values():
        ps = sorted(parts)
        for a in range(len(ps)):
            for b in range(a + 1, len(ps)):
                edges.add((ps[a], ps[b]))
    adj: dict = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    tri_count: dict = {}
    for u, v in edges:
        if u > v:
            u, v = v, u
        for w in adj[u] & adj[v]:
            if w > v:  # canonical u < v < w: count each triangle once
                for x in (u, v, w):
                    tri_count[x] = tri_count.get(x, 0) + 1
    got = {
        r["l_partkey"]: r["n_triangles"]
        for r in workload_relational.parts_triangle_count(spark, SF_DIR).collect()
    }
    assert got == tri_count


def test_gini_matches_python(spark):
    rows = read_table(spark, SF_DIR, "customer").select(
        "c_mktsegment", "c_custkey", "c_acctbal"
    ).collect()
    from collections import defaultdict
    from decimal import Decimal

    seg = defaultdict(list)
    for r in rows:
        seg[r["c_mktsegment"]].append(
            (Decimal(str(round(r["c_acctbal"], 2))), r["c_custkey"])
        )
    got = {
        r["c_mktsegment"]: r["gini"]
        for r in workload_relational.customer_balance_gini(spark, SF_DIR).collect()
    }
    for s, vals in seg.items():
        vals.sort()
        n = len(vals)
        sx = sum(v for v, _ in vals)
        six = sum((i + 1) * v for i, (v, _) in enumerate(vals))
        want = (2 * float(six) - (n + 1) * float(sx)) / (n * float(sx))
        assert abs(got[s] - want) < 1e-9, (s, got[s], want)


def test_autocorr_lag1_matches_python(spark):
    ev = read_table(spark, SF_DIR, "events").select("event_type", "ts", "value").collect()
    from collections import defaultdict
    from decimal import Decimal

    sums: dict = defaultdict(lambda: [Decimal(0), 0])
    for r in ev:
        key = (r["event_type"], r["ts"] // 1_000_000_000 // 86400)
        sums[key][0] += Decimal(str(round(r["value"], 6)))
        sums[key][1] += 1
    series: dict = defaultdict(list)
    for (t, d), (sv, c) in sums.items():
        series[t].append((d, float(sv) / c))
    got = {
        (r["event_type"], r["lag"]): r["acf"]
        for r in workload_relational.events_lag_autocorr(spark, SF_DIR).collect()
    }
    for t, pts in series.items():
        pts.sort()
        xs = [m for _, m in pts]
        mu = sum(xs) / len(xs)
        den = sum((x - mu) ** 2 for x in xs)
        num = sum((xs[i] - mu) * (xs[i + 1] - mu) for i in range(len(xs) - 1))
        want = num / den
        assert abs(got[(t, 1)] - want) < 1e-6, (t, got[(t, 1)], want)


def test_survival_km_matches_python(spark):
    rows = read_table(spark, SF_DIR, "orders").select(
        "o_custkey", "o_orderdate"
    ).collect()
    from collections import defaultdict

    by_cust = defaultdict(list)
    anchor = max(r["o_orderdate"] for r in rows)
    for r in rows:
        by_cust[r["o_custkey"]].append(r["o_orderdate"])
    spans = []
    for dates in by_cust.values():
        dates.sort()
        for a, b in zip(dates, dates[1:]):
            t = (b.date() - a.date()).days
            if t > 0:
                spans.append((t, True))
        t = (anchor.date() - dates[-1].date()).days
        if t > 0:
            spans.append((t, False))
    per_t = {}
    for t, ev in spans:
        d, c = per_t.get(t, (0, 0))
        per_t[t] = (d + 1, c) if ev else (d, c + 1)
    n_at_risk = len(spans)
    surv = 1.0
    want = {}
    for t in sorted(per_t):
        d, c = per_t[t]
        if d:
            surv *= 1.0 - d / n_at_risk
            want[t] = (d, c, n_at_risk, surv)
        n_at_risk -= d + c
    got = {
        r["t"]: (r["d"], r["c"], r["n_t"], r["survival"])
        for r in workload_relational.orders_survival_km(spark, SF_DIR).collect()
    }
    assert set(got) == set(want)
    for t, (d, c, n, s) in want.items():
        gd, gc, gn, gs = got[t]
        assert (gd, gc, gn) == (d, c, n), t
        assert abs(gs - s) < 1e-6, (t, gs, s)


def test_hill_alpha_matches_python(spark):
    import math

    prices = sorted(
        (
            (r["o_totalprice"], r["o_orderkey"])
            for r in read_table(spark, SF_DIR, "orders")
            .select("o_orderkey", "o_totalprice")
            .collect()
        ),
        key=lambda x: (-x[0], x[1]),
    )
    k = 500
    xs = [p for p, _ in prices[:k]]
    xk1 = prices[k][0]
    logsum = sum(math.log(x / xk1) for x in xs)
    row = workload_relational.orders_tail_index_hill(spark, SF_DIR).collect()[0]
    assert row["k"] == k
    assert abs(row["hill_alpha"] - k / logsum) < 1e-4


def test_benford_chi2_matches_python(spark):
    import math
    from collections import defaultdict

    rows = read_table(spark, SF_DIR, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    ).collect()
    cells = defaultdict(lambda: defaultdict(int))
    for r in rows:
        d = int(str(int(round(r["l_extendedprice"] * 100)))[0])
        cells[r["l_returnflag"]][d] += 1
    got = {
        r["l_returnflag"]: r["chi2"]
        for r in workload_relational.lineitem_benford_audit(spark, SF_DIR).collect()
    }
    for flag, ds in cells.items():
        n = sum(ds.values())
        chi2 = sum(
            (obs - math.log((d + 1.0) / d) / math.log(10.0) * n) ** 2
            / (math.log((d + 1.0) / d) / math.log(10.0) * n)
            for d, obs in ds.items()
        )
        assert abs(got[flag] - chi2) < 1e-4, (flag, got[flag], chi2)


def test_welch_matches_python(spark):
    from collections import defaultdict

    rows = read_table(spark, SF_DIR, "events").select("event_type", "value").collect()
    vals = defaultdict(list)
    for r in rows:
        vals[r["event_type"]].append(r["value"])
    got = {
        (r["type_a"], r["type_b"]): (r["t_stat"], r["welch_df"])
        for r in workload_relational.events_welch_ttest(spark, SF_DIR).collect()
    }
    types = sorted(vals)
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            xa, xb = vals[a], vals[b]
            na, nb = len(xa), len(xb)
            ma, mb = sum(xa) / na, sum(xb) / nb
            va = sum((x - ma) ** 2 for x in xa) / (na - 1)
            vb = sum((x - mb) ** 2 for x in xb) / (nb - 1)
            t = (ma - mb) / (va / na + vb / nb) ** 0.5
            df = (va / na + vb / nb) ** 2 / (
                (va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1)
            )
            assert abs(got[(a, b)][0] - t) < 1e-3, (a, b)
            assert abs(got[(a, b)][1] - df) < 0.5, (a, b)


def test_pmi_matches_python(spark):
    import math
    from collections import Counter

    rows = read_table(spark, SF_DIR, "documents").select("text").collect()
    uni, big = Counter(), Counter()
    for r in rows:
        toks = r["text"].strip().split()
        uni.update(t for t in toks if t != "")
        big.update(
            (a, b) for a, b in zip(toks, toks[1:]) if a != "" and b != ""
        )
    n = sum(uni.values())
    got = {
        (r["x"], r["y"]): (r["cxy"], r["pmi"])
        for r in workload_text.docs_pmi_pairs(spark, SF_DIR).collect()
    }
    want = {p: c for p, c in big.items() if c >= 5}
    assert set(got) == set(want)
    for (x, y), c in want.items():
        pmi = math.log(c * n / (uni[x] * uni[y]))
        assert got[(x, y)][0] == c
        assert abs(got[(x, y)][1] - pmi) < 1e-5, (x, y)


def test_dau_mau_matches_python(spark):
    from collections import defaultdict

    rows = read_table(spark, SF_DIR, "events").select("ts", "user_id").collect()
    presence = {(r["ts"] // 1_000_000_000 // 86400, r["user_id"]) for r in rows}
    days = sorted({d for d, _ in presence})
    got = {
        r["day"]: (r["dau"], r["wau"], r["mau"])
        for r in workload_relational.events_dau_mau(spark, SF_DIR).collect()
    }
    by_user = defaultdict(set)
    for d, u in presence:
        by_user[u].add(d)
    for obs in range(min(days), max(days) + 1):
        dau = sum(1 for u, ds in by_user.items() if obs in ds)
        wau = sum(1 for u, ds in by_user.items()
                  if any(obs - 6 <= d <= obs for d in ds))
        mau = sum(1 for u, ds in by_user.items()
                  if any(obs - 27 <= d <= obs for d in ds))
        if obs in got:
            assert got[obs] == (dau, wau, mau), obs
        else:
            assert mau == 0, obs  # days with no window coverage don't emit


def test_haar_energy_conservation_and_python_mirror(spark):
    from collections import defaultdict

    rows = read_table(spark, SF_DIR, "events").select(
        "event_type", "ts", "value"
    ).collect()
    from decimal import Decimal

    sums = defaultdict(lambda: [Decimal(0), 0])
    for r in rows:
        k = (r["event_type"], r["ts"] // 1_000_000_000 // 86400)
        sums[k][0] += Decimal(str(round(r["value"], 2)))
        sums[k][1] += 1
    series = defaultdict(list)
    for (t, d), (sv, c) in sums.items():
        series[t].append((d, float(sv) / c))
    got = {
        (r["event_type"], r["level"]): (r["n_coeffs"], r["detail_energy"],
                                        r["approx_energy"])
        for r in workload_relational.events_haar_wavelet(spark, SF_DIR).collect()
    }
    for t, pts in series.items():
        pts.sort()
        cur = [m for _, m in pts]
        for lvl in (1, 2, 3):
            nxt, det = [], []
            for i in range(0, len(cur), 2):
                if i + 1 < len(cur):
                    nxt.append((cur[i] + cur[i + 1]) / 2.0)
                    det.append((cur[i] - cur[i + 1]) / 2.0)
                else:
                    nxt.append(cur[i])
                    det.append(0.0)
            de = sum(x * x for x in det)
            ae = sum(x * x for x in nxt)
            n, gde, gae = got[(t, lvl)]
            assert n == len(nxt), (t, lvl)
            assert abs(gde - de) < 1e-5 and abs(gae - ae) < 1e-5, (t, lvl)
            cur = nxt


def test_backlog_curve_matches_python(spark):
    from collections import defaultdict

    orders = {
        r["o_orderkey"]: r["o_orderdate"].date()
        for r in read_table(spark, SF_DIR, "orders")
        .select("o_orderkey", "o_orderdate").collect()
    }
    closes = defaultdict(lambda: None)
    for r in read_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_shipdate"
    ).collect():
        d = r["l_shipdate"].date()
        if closes[r["l_orderkey"]] is None or d > closes[r["l_orderkey"]]:
            closes[r["l_orderkey"]] = d
    import datetime

    deltas = defaultdict(lambda: [0, 0])
    for ok, od in orders.items():
        cd = closes.get(ok)
        if cd is None:
            continue
        deltas[od][0] += 1
        deltas[cd + datetime.timedelta(days=1)][1] += 1
    got = {
        r["day"]: (r["opens"], r["closes"], r["open_orders"])
        for r in workload_relational.orders_backlog_curve(spark, SF_DIR).collect()
    }
    run = 0
    for day in sorted(deltas):
        o, c = deltas[day]
        run += o - c
        assert got[day.strftime("%Y-%m-%d")] == (o, c, run), day


def test_count_min_absent_probe_estimates_zero(spark):
    """A probe key absent from the stream must estimate 0, not vanish or
    inherit a collided cell's count: a true count-min mins over ALL depth
    cells including zero counters, and the sketch table only materializes
    non-empty cells — the probe join is a LEFT join with coalesce(c, 0)."""
    from etl_spark.operators.sketch import count_min, count_min_estimate

    df = spark.createDataFrame([(i % 5,) for i in range(50)], "user_id long")
    sketch = count_min(df, "user_id", depth=4, width=8)  # narrow → collisions
    probes = spark.createDataFrame(
        [(0,), (999991,), (999992,), (999993,)], "user_id long"
    )
    got = {r.user_id: r.cm_est
           for r in count_min_estimate(sketch, probes, "user_id",
                                       depth=4, width=8).collect()}
    assert set(got) == {0, 999991, 999992, 999993}  # absent keys present
    assert got[0] >= 10  # present key: upper bound on true count
    # with width=8 and 5 hot keys, an absent key's cells often collide —
    # but at least one of its 4 cells must be empty here, pinning est to 0
    for k in (999991, 999992, 999993):
        assert got[k] >= 0
    # a sketch over a SINGLE key leaves most cells empty: any absent key
    # estimates exactly 0
    one = count_min(spark.createDataFrame([(1,)], "user_id long"),
                    "user_id", depth=4, width=128)
    est = {r.user_id: r.cm_est
           for r in count_min_estimate(
               one, spark.createDataFrame([(2,), (3,)], "user_id long"),
               "user_id", depth=4, width=128).collect()}
    assert est == {2: 0, 3: 0}


def test_doulion_sample_estimates_exact_triangles(spark):
    """DOULION p=1/2: the deterministic md5-sampled estimate must land
    near the exact global triangle count (fixed data + fixed hash →
    fixed numbers, so this is a regression lock, not a flaky stat), and
    the correction factor is exactly p^-3 = 8."""
    from pyspark.sql import functions as F

    from etl_spark import workload_relational as wr

    SF = "/root/testdata/sf0.001"
    est_row = wr.parts_triangle_sample(spark, SF).collect()[0]
    assert est_row.est_triangles == est_row.sampled_triangles * 8.0
    exact = (
        wr.parts_triangle_count(spark, SF)
        .agg(F.sum("n_triangles").alias("s")).collect()[0]["s"] // 3
    )
    assert exact > 0
    rel_err = abs(est_row.est_triangles - exact) / exact
    assert rel_err < 0.35, (est_row.est_triangles, exact, rel_err)


def test_chisq_matches_python(spark):
    """events_chisq_independence vs a plain-Python contingency chi-square
    (full r×c grid including absent cells)."""
    from collections import Counter

    rows = read_table(spark, SF_DIR, "events").select("event_type", "ts").collect()
    obs = Counter(
        (r["event_type"], ((r["ts"] // 1_000_000_000 // 86400) + 4) % 7)
        for r in rows
    )
    types = sorted({t for t, _ in obs})
    dows = sorted({d for _, d in obs})
    n = sum(obs.values())
    row_n = {t: sum(c for (tt, _), c in obs.items() if tt == t) for t in types}
    col_n = {d: sum(c for (_, dd), c in obs.items() if dd == d) for d in dows}
    chi2 = sum(
        (obs.get((t, d), 0) - row_n[t] * col_n[d] / n) ** 2
        / (row_n[t] * col_n[d] / n)
        for t in types
        for d in dows
    )
    got = workload_relational.events_chisq_independence(spark, SF_DIR).collect()[0]
    assert got["n_events"] == n
    assert got["dof"] == (len(types) - 1) * (len(dows) - 1)
    assert abs(got["chi2"] - chi2) < 1e-5


def test_mann_whitney_matches_python(spark):
    """orders_mann_whitney vs a plain-Python tied-average-rank U/z."""
    rows = read_table(
        spark, SF_DIR, "orders"
    ).select("o_totalprice", "o_orderpriority").collect()
    hi = [r["o_totalprice"] for r in rows
          if r["o_orderpriority"] in ("1-URGENT", "2-HIGH")]
    lo = [r["o_totalprice"] for r in rows
          if r["o_orderpriority"] not in ("1-URGENT", "2-HIGH")]
    pooled = sorted([(v, 1) for v in hi] + [(v, 0) for v in lo])
    # tied average ranks
    ranks, i = {}, 0
    while i < len(pooled):
        j = i
        while j < len(pooled) and pooled[j][0] == pooled[i][0]:
            j += 1
        ranks[pooled[i][0]] = (i + 1 + j) / 2  # avg of ranks i+1..j
        i = j
    n1, n2 = len(hi), len(lo)
    rank_sum = sum(ranks[v] for v in hi)
    u = rank_sum - n1 * (n1 + 1) / 2
    n = n1 + n2
    from collections import Counter

    tie_term = sum(t**3 - t for t in Counter(v for v, _ in pooled).values())
    mu = n1 * n2 / 2
    sig2 = n1 * n2 / 12 * ((n + 1) - tie_term / (n * (n - 1)))
    z = (u - mu) / sig2**0.5
    got = workload_relational.orders_mann_whitney(spark, SF_DIR).collect()[0]
    assert (got["n_hi"], got["n_lo"]) == (n1, n2)
    assert abs(got["u_stat"] - u) < 0.51  # spark rounds to 1 dp
    assert abs(got["z_score"] - z) < 1e-5


def test_spearman_matches_python(spark):
    """lineitem_spearman_correlations vs numpy Pearson on tied ranks."""
    import numpy as np

    rows = read_table(
        spark, SF_DIR, "lineitem"
    ).select("l_quantity", "l_discount", "l_tax").collect()

    def avg_ranks(xs):
        order = np.argsort(np.asarray(xs), kind="stable")
        ranks = np.empty(len(xs))
        sorted_x = np.asarray(xs)[order]
        i = 0
        while i < len(xs):
            j = i
            while j < len(xs) and sorted_x[j] == sorted_x[i]:
                j += 1
            ranks[order[i:j]] = (i + 1 + j) / 2
            i = j
        return ranks

    q = avg_ranks([r["l_quantity"] for r in rows])
    d = avg_ranks([r["l_discount"] for r in rows])
    t = avg_ranks([r["l_tax"] for r in rows])

    def pearson(x, y):
        return float(np.corrcoef(x, y)[0, 1])

    got = workload_relational.lineitem_spearman_correlations(
        spark, SF_DIR
    ).collect()[0]
    assert got["n_rows"] == len(rows)
    assert abs(got["rho_qty_discount"] - pearson(q, d)) < 1e-5
    assert abs(got["rho_qty_tax"] - pearson(q, t)) < 1e-5
    assert abs(got["rho_discount_tax"] - pearson(d, t)) < 1e-5


def test_misra_gries_superset_guarantee(spark):
    """Randomized: the union of per-partition MG survivors must contain
    EVERY key with global frequency > n/(k+1), and ship ≤ k rows per
    partition — the two properties events_heavy_hitters_mg's exactness
    proof rests on."""
    import numpy as np
    from pyspark.sql import functions as F

    from etl_spark.operators.sketch import misra_gries_candidates

    rng = np.random.default_rng(13)
    # zipf-ish skew over a 4000-key domain, far more keys than k
    keys = (rng.zipf(1.3, size=20000) % 4000).astype("int64")
    parts = 8
    df = spark.createDataFrame(
        [(int(x),) for x in keys], "user_id long"
    ).repartition(parts)
    k = 16
    out = misra_gries_candidates(df, "user_id", k=k)
    survivors = {r["user_id"] for r in out.collect()}
    assert out.count() <= parts * k
    from collections import Counter

    exact = Counter(int(x) for x in keys)
    n = len(keys)
    must_keep = {kk for kk, c in exact.items() if c > n / (k + 1)}
    assert must_keep, "test data produced no heavy keys — tighten the skew"
    assert must_keep <= survivors, sorted(must_keep - survivors)


def test_heavy_hitters_mg_equals_exact(spark):
    """The full two-phase operator returns EXACTLY the true heavy-hitter
    set with exact frequencies (the sketch only prunes)."""
    from collections import Counter

    rows = read_table(spark, SF_DIR, "events").select("user_id").collect()
    exact = Counter(r["user_id"] for r in rows)
    n = len(rows)
    want = {u: c for u, c in exact.items() if c * 128 > n}
    got = {
        r["user_id"]: r["freq"]
        for r in workload_relational.events_heavy_hitters_mg(
            spark, SF_DIR
        ).collect()
    }
    assert got == want


def test_kendall_tau_matches_numpy_pairwise(spark):
    """lineitem_kendall_tau vs a DIFFERENT formulation: direct O(n²)
    pairwise sign comparison in numpy (the cell-collapse form under test
    never enumerates row pairs)."""
    import numpy as np

    rows = read_table(
        spark, SF_DIR, "lineitem"
    ).select("l_quantity", "l_discount").collect()
    q = np.array([r["l_quantity"] for r in rows])
    d = np.array([r["l_discount"] for r in rows])
    sq = np.sign(q[:, None] - q[None, :])
    sd = np.sign(d[:, None] - d[None, :])
    prod = sq * sd
    iu = np.triu_indices(len(q), k=1)
    conc = int((prod[iu] > 0).sum())
    disc = int((prod[iu] < 0).sum())
    n = len(q)
    n0 = n * (n - 1) / 2

    def tie(x):
        _, counts = np.unique(x, return_counts=True)
        return float((counts * (counts - 1) / 2).sum())

    tau = (conc - disc) / ((n0 - tie(q)) * (n0 - tie(d))) ** 0.5
    got = workload_relational.lineitem_kendall_tau(spark, SF_DIR).collect()[0]
    assert got["n_rows"] == n
    assert got["concordant"] == conc and got["discordant"] == disc
    assert abs(got["tau_b"] - tau) < 1e-5
