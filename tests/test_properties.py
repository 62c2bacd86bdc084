"""Property-style differential tests: the array-fold operators vs
straightforward Python brute force on randomized (seeded) inputs —
SURVEY.md §5.4's property-testing layer."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from interpro7_dw_spark.domain.fragments import condense_locations_col
from interpro7_dw_spark.functions.intervals import condense_intervals, interval_union_length


def _python_condense(locations: list[list[tuple[int, int]]], min_overlap=0.1):
    """Reference semantics (interpro/oracle/matches.py:60-103),
    independent brute-force restatement."""
    spans = sorted((loc[0][0], max(e for _, e in loc)) for loc in locations)
    start = end = None
    out = []
    for s, e in spans:
        if start is None:
            start, end = s, e
        elif e <= end:
            continue
        elif s <= end and (min(end, e) - max(start, s) + 1) >= (min(end - start, e - s) + 1) * min_overlap:
            end = e
        else:
            out.append((start, end))
            start, end = s, e
    out.append((start, end))
    return out


def test_condense_matches_python_reference(spark):
    rng = random.Random(42)
    cases = []
    for _ in range(200):
        n_locs = rng.randint(1, 8)
        locs = []
        for _ in range(n_locs):
            n_frags = rng.randint(1, 3)
            frags = []
            for _ in range(n_frags):
                s = rng.randint(1, 300)
                frags.append((s, s + rng.randint(0, 120)))
            frags.sort()
            locs.append(frags)
        cases.append(locs)
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)],
        "case_id int, locs array<array<struct<start: bigint, end: bigint>>>",
    )
    got = {
        r["case_id"]: [(c["start"], c["end"]) for c in r["c"]]
        for r in df.select("case_id", condense_locations_col(F.col("locs")).alias("c")).collect()
    }
    for i, c in enumerate(cases):
        assert got[i] == _python_condense(c), f"case {i}: {c}"


def test_interval_union_and_condense_consistency(spark):
    rng = random.Random(7)
    cases = []
    for _ in range(200):
        ivs = []
        for _ in range(rng.randint(1, 10)):
            s = rng.randint(0, 200)
            ivs.append((s, s + rng.randint(0, 50)))
        cases.append(ivs)
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)],
        "case_id int, ivs array<struct<s: bigint, e: bigint>>",
    )
    rows = df.select(
        "case_id",
        interval_union_length(F.col("ivs")).alias("len"),
        condense_intervals(F.col("ivs")).alias("merged"),
    ).collect()
    for r in rows:
        ivs = cases[r["case_id"]]
        brute = set()
        for s, e in ivs:
            brute.update(range(s, e + 1))
        assert r["len"] == len(brute), f"case {r['case_id']}: {ivs}"
        # condensed intervals: disjoint, sorted, non-adjacent, same coverage
        merged = [(m["s"], m["e"]) for m in r["merged"]]
        assert merged == sorted(merged)
        assert all(a[1] + 1 < b[0] for a, b in zip(merged, merged[1:]))
        covered = set()
        for s, e in merged:
            covered.update(range(s, e + 1))
        assert covered == brute


def test_occupancy_matches_python_reference_and_bounds(spark):
    # occupancy fold (domain/hmm.py::occupancy_col) vs a brute-force
    # restatement of interpro/oracle/hmms.py:346-353, on randomized
    # probability-shaped transitions; values stay in [0, 1]
    from interpro7_dw_spark.domain.hmm import occupancy_col

    rng = random.Random(7)
    rows = []
    expected = {}
    for m in range(50):
        M = rng.randint(2, 30)
        trans = []
        for _ in range(M):
            mm = rng.uniform(0.1, 0.8)
            mi = rng.uniform(0.0, 1.0 - mm - 0.05)
            dm = rng.uniform(0.0, 1.0)
            trans.append((mm, mi, dm))
        occ = [0.0] * (M + 1)
        occ[1] = trans[0][1] + trans[0][0]
        for k in range(2, M + 1):
            mm, mi, dm = trans[k - 1]
            occ[k] = occ[k - 1] * (mm + mi) + (1.0 - occ[k - 1]) * dm
        expected[m] = occ[1:]
        rows.append((m, [tuple(t) for t in trans]))
    df = spark.createDataFrame(
        rows, "m int, trans array<struct<mm double, mi double, dm double>>"
    )
    got = {
        r["m"]: r["occ"]
        for r in df.select("m", occupancy_col("trans").alias("occ")).collect()
    }
    for m, exp in expected.items():
        assert len(got[m]) == len(exp)
        for a, b in zip(got[m], exp):
            assert abs(a - b) < 1e-12
            assert -1e-12 <= a <= 1.0 + 1e-12


def test_toad_statuses_invariant(spark):
    # every multi-fragment group has exactly one C-terminal-disc
    # (first) and one N-terminal-disc (last); singletons CONTINUOUS
    from interpro7_dw_spark.domain.fragments import reassemble_toad_fragments

    rng = random.Random(11)
    rows = []
    for g in range(80):
        n = rng.randint(1, 5)
        for _ in range(n):
            s = rng.randint(1, 400)
            rows.append((f"P{g % 9}", f"S{g % 7}", g, s, s + rng.randint(1, 60), 1.0))
    df = spark.createDataFrame(
        rows,
        "protein_acc string, signature_acc string, group_id int,"
        " pos_from long, pos_to long, score double",
    )
    for r in reassemble_toad_fragments(df).collect():
        statuses = [f["dc_status"] for f in r["fragments"]]
        starts = [f["start"] for f in r["fragments"]]
        assert starts == sorted(starts)
        if len(statuses) == 1:
            assert statuses == ["CONTINUOUS"]
        else:
            assert statuses[0] == "C_TERMINAL_DISC"
            assert statuses[-1] == "N_TERMINAL_DISC"
            assert all(x == "NC_TERMINAL_DISC" for x in statuses[1:-1])


def test_near_dup_threshold_monotonicity(spark):
    # pairs at a higher cosine threshold are a subset of pairs at a
    # lower one, and every pair is a<b canonical
    from interpro7_dw_spark.operators.similarity import cosine_near_dup_pairs

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    lo = {(r["a_id"], r["b_id"]) for r in cosine_near_dup_pairs(emb, 0.20).collect()}
    hi = {(r["a_id"], r["b_id"]) for r in cosine_near_dup_pairs(emb, 0.35).collect()}
    assert hi <= lo
    assert all(a < b for a, b in lo)


def test_intact_extraction_matches_python_reference(spark):
    """Randomized PSI-MI rows: the JVM regex pipeline
    (domain/intact.py) vs an independent Python-re restatement of the
    reference rules (intact.py:24-133) — a third engine next to the
    DuckDB oracle."""
    import re

    from interpro7_dw_spark.domain.intact import interpro_interactions

    rng = random.Random(7)

    def maybe(p, s):
        return s if rng.random() < p else ""

    rows = []
    for ord_ in range(400):
        iprs = [f"IPR{rng.randint(0, 30):06d}" for _ in range(rng.randint(0, 3))]
        feat_a = "|".join(
            [f"binding region:{x}(t)" for x in iprs[:2]] + ["mutation:-"]
        )
        feat_b = "|".join([f"sufficient:{x}" for x in iprs[2:]]) or "-"
        ids_a = maybe(0.9, f"uniprotkb:P{rng.randint(0, 40):05d}|") + "intact:EBI-A"
        ids_b = maybe(0.9, f"UniProtKB:Q{rng.randint(0, 40):05d}")
        alias_core = f"nm{rng.randint(0, 20)}"
        aliases_a = maybe(0.5, f"psi-mi:{alias_core}(display_long)|") + maybe(
            0.8, f"uniprotkb:g{alias_core}(gene name)"
        )
        aliases_b = maybe(0.6, f"psi-mi:{alias_core}b(display_long)") or maybe(
            0.7, f"uniprotkb:gb{rng.randint(0, 20)}(gene name)"
        )
        pubs = maybe(0.85, f"pubmed:{rng.randint(1, 99999)}|") + "doi:10.1/x"
        inter = maybe(0.85, f"intact:EBI-{rng.randint(0, 50)}|") + "imex:IM-1"
        n_types = rng.randint(1, 2)
        type_a = "|".join(
            f'psi-mi:"MI:{rng.randint(0, 9)}"(t{j})' for j in range(n_types)
        )
        type_b = 'psi-mi:"MI:0328"(small molecule)'
        rows.append(
            (ord_, ids_a, ids_b, aliases_a, aliases_b, pubs, inter,
             type_a, type_b, feat_a, feat_b)
        )

    # independent restatement of the reference parse
    def interactor(ids, aliases, types):
        acc = name = typ = None
        m = re.search(r"uniprotkb:([A-Z0-9]+)", ids, flags=re.I)
        acc = m.group(1) if m else None
        m = re.search(r"psi-mi:([^(]+)\(display_long\)", aliases, flags=re.I)
        if m:
            name = m.group(1).upper()
        else:
            m = re.search(r"uniprotkb:([^(|]+)", aliases, flags=re.I)
            name = m.group(1) if m else None
        parts = types.split("|")
        if len(parts) == 1:
            m = re.search(r'psi-mi:"MI:\d+"\(([^)]+)\)', types, flags=re.I)
            typ = m.group(1) if m else None
        return acc, name, typ

    expected = {}
    for (ord_, ids_a, ids_b, aliases_a, aliases_b, pubs, inter,
         type_a, type_b, feat_a, feat_b) in rows:
        accs = set(re.findall(r"IPR\d{6}", feat_a)) | set(
            re.findall(r"IPR\d{6}", feat_b)
        )
        if not accs:
            continue
        m = re.search(r"intact:(EBI-\d+)", inter, flags=re.I)
        iid = m.group(1) if m else None
        m = re.search(r"pubmed:(\d+)", pubs, flags=re.I)
        pmid = int(m.group(1)) if m else None
        a1, n1, t1 = interactor(ids_a, aliases_a, type_a)
        a2, n2, t2 = interactor(ids_b, aliases_b, type_b)
        if iid and pmid and a1 and n1 and t1 and a2 and n2 and t2:
            for acc in accs:
                expected[(acc, iid)] = (pmid, a1, n1, t1, a2, n2, t2)

    schema = (
        "ord bigint, ids_a string, ids_b string, aliases_a string, "
        "aliases_b string, publication_ids string, interaction_ids string, "
        "type_a string, type_b string, feature_a string, feature_b string"
    )
    got = {
        (r.entry_acc, r.intact_id): (
            r.pubmed_id, r.acc_1, r.name_1, r.type_1,
            r.acc_2, r.name_2, r.type_2,
        )
        for r in interpro_interactions(
            spark.createDataFrame(rows, schema)
        ).collect()
    }
    assert got == expected


def test_bucket_split_rank_matches_python_reference(spark):
    """Randomized (seeded) differential test: the two-phase
    bucket-split global rank / running sum (operators/sampling.py)
    must equal a brute-force Python restatement — per stratum, rows
    ordered by (md5(id), id), rank = position, run = prefix token
    sum — across skewed stratum shapes and bucket counts."""
    import hashlib

    from interpro7_dw_spark.operators.sampling import _range_annotated

    rng = random.Random(7)
    rows = []
    # skew: one hot stratum holds most rows; a singleton; a mid one
    for i in range(400):
        src = "hot" if i % 10 else ("solo" if i == 0 else "mid")
        rows.append((i, src, rng.randint(1, 500)))
    docs = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")

    expect = {}
    for src in {"hot", "solo", "mid"}:
        grp = sorted(
            (r for r in rows if r[1] == src),
            key=lambda r: (hashlib.md5(str(r[0]).encode()).hexdigest(), r[0]),
        )
        run = 0
        for rank, (i, _, tok) in enumerate(grp, start=1):
            run += tok
            expect[i] = (rank, run)

    for n_buckets in (1, 3, 32, 65536):
        got = {
            r["doc_id"]: (r["__rank"], r["__run"])
            for r in _range_annotated(
                docs, ["source"], "doc_id", n_buckets, token_col="n_tokens"
            ).collect()
        }
        assert got == expect, f"buckets={n_buckets}"
