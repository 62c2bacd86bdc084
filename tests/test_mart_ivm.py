"""domain/mart_ivm.py — incremental maintenance of the real
taxon-xrefs mart: maintained supports == full rebuild, at every
checkpoint of a long changelog, with flat per-epoch cost."""

from __future__ import annotations

from pyspark.sql import functions as F

from interpro7_dw_spark.domain.mart_ivm import (
    SUPPORT_KEYS,
    apply_count_delta,
    maintain_taxon_supports,
    seed_taxon_supports,
    taxon_mart_from_supports,
)
from interpro7_dw_spark.domain.marts import taxon_xrefs_mart
from interpro7_dw_spark.operators.cdc import snapshot_delta_images


def _anc(spark):
    # 3-level taxonomy: leaves N0..N5 -> regions R0..R2 -> ROOT
    rows = []
    for n in range(6):
        rows += [(f"N{n}", f"N{n}"), (f"N{n}", f"R{n % 3}"), (f"N{n}", "ROOT")]
    return spark.createDataFrame(rows, "tax_id string, ancestor string")


def _pp(spark):
    return spark.createDataFrame(
        [(f"P{i}", f"UP{i % 4}") for i in range(0, 60, 2)],
        "protein_acc string, proteome_id string",
    )


def _ps(spark):
    return spark.createDataFrame(
        [(f"P{i}", f"PDB{i % 5}") for i in range(0, 60, 3)],
        "protein_acc string, pdb_id string",
    )


def _p_df(spark, d):
    return spark.createDataFrame(
        sorted((k, v) for k, v in d.items()),
        "protein_acc string, tax_id string",
    )


def _m_df(spark, d, with_id=True):
    rows = sorted((k, *v) for k, v in d.items())
    df = spark.createDataFrame(
        rows, "match_id long, protein_acc string, signature_acc string, database string"
    )
    return df if with_id else df.drop("match_id")


def _mart_rows(df):
    return {
        r.tax_id: (r.n_proteins, r.n_proteomes, r.n_structures, r.db_json)
        for r in df.collect()
    }


def _rebuild(spark, p_d, m_d):
    return taxon_xrefs_mart(
        _p_df(spark, p_d),
        _m_df(spark, m_d, with_id=False),
        _pp(spark),
        _ps(spark),
        _anc(spark),
    )


def test_mart_ivm_single_epoch_equals_full_rebuild(spark):
    """One changelog epoch covering every change species — protein
    insert/delete/taxon move, match insert/delete/signature change,
    and their interactions (a moved protein whose match also changed;
    a deleted protein with live matches) — maintained render equals
    the full taxon_xrefs_mart rebuild of the new snapshot."""
    p_old = {f"P{i}": f"N{i % 6}" for i in range(24)}
    m_old = {
        j: (f"P{j % 24}", f"SIG{j % 9}", f"DB{(j % 9) % 3}") for j in range(70)
    }
    p_new = dict(p_old)
    p_new.pop("P3")                      # delete (its matches must retract)
    p_new["P4"] = "N1"                   # taxon move (from N4)
    p_new["P5"] = "N2"                   # taxon move + its match changes below
    p_new["P24"] = "N0"                  # insert
    p_new["P25"] = "N5"                  # insert (gets a new match below)
    m_new = dict(m_old)
    m_new.pop(10)                        # delete a match
    m_new[11] = ("P11", "SIG0", "DB0")   # signature change
    m_new[29] = ("P5", "SIG8", "DB2")    # change a MOVED protein's match
    m_new[100] = ("P25", "SIG1", "DB1")  # insert for an inserted protein
    m_new[101] = ("P3", "SIG2", "DB2")   # insert for a DELETED protein (must not count)

    sup0 = seed_taxon_supports(
        _p_df(spark, p_old), _m_df(spark, m_old, with_id=False),
        _pp(spark), _ps(spark), _anc(spark),
    )
    dp = snapshot_delta_images(
        _p_df(spark, p_old), _p_df(spark, p_new), ["protein_acc"], ["tax_id"]
    )
    dm = snapshot_delta_images(
        _m_df(spark, m_old), _m_df(spark, m_new), ["match_id"],
        ["protein_acc", "signature_acc", "database"],
    )
    sup1 = maintain_taxon_supports(
        sup0, dp, dm, _p_df(spark, p_new), _m_df(spark, m_old, with_id=False),
        _pp(spark), _ps(spark), _anc(spark),
    )
    got = _mart_rows(taxon_mart_from_supports(sup1))
    want = _mart_rows(_rebuild(spark, p_new, m_new))
    assert got == want
    # and the maintained supports never hold zero/negative counts
    for name in SUPPORT_KEYS:
        assert sup1[name].filter(F.col("n") <= 0).count() == 0, name


def test_apply_count_delta_exit_at_zero_and_null_keys(spark):
    """The count merge drops rows reaching zero (that exit IS the
    distinct-count maintenance) and treats NULL group values as a
    legal key on both sides."""
    sup = spark.createDataFrame(
        [("a", 2), (None, 1)], "k string, n long"
    )
    d = spark.createDataFrame(
        [("a", -2), (None, 1), ("b", 3)], "k string, s long"
    )
    got = {r.k: r.n for r in apply_count_delta(sup, d, ["k"]).collect()}
    assert got == {None: 2, "b": 3}


def test_mart_ivm_many_epochs_cost_tracks_delta(spark, tmp_path):
    """Multi-epoch mart stressor (the tests/test_streaming.py:509
    pattern, on the REAL warehouse mart): each epoch mutates both the
    protein dimension (insert/move/delete) and the match facts
    (insert/signature-change/delete), supports persist to parquet
    between epochs (the production shape), maintained == full rebuild
    at three checkpoints, and per-epoch maintain time stays flat —
    cost follows |delta| + supports, not release age. 15 epochs, not
    40: one mart epoch is five support merges + five parquet
    round-trips (vs the single-mart streaming stressor), and O(age)
    growth — the thing the flatness bound guards — would already be
    visible across 15."""
    import statistics
    import time

    n_epochs = 15
    p_cur = {f"P{i}": f"N{i % 6}" for i in range(24)}
    m_cur = {j: (f"P{j % 24}", f"SIG{j % 9}", f"DB{(j % 9) % 3}") for j in range(70)}

    state = str(tmp_path / "sup")

    def write(sup, e):
        for name, df in sup.items():
            df.write.mode("overwrite").parquet(f"{state}/{name}/v{e}")

    def read(e):
        return {
            name: spark.read.parquet(f"{state}/{name}/v{e}")
            for name in SUPPORT_KEYS
        }

    sup = seed_taxon_supports(
        _p_df(spark, p_cur), _m_df(spark, m_cur, with_id=False),
        _pp(spark), _ps(spark), _anc(spark),
    )
    write(sup, 0)

    walls = []
    checkpoints = (4, 9, n_epochs - 1)
    for e in range(n_epochs):
        p_nxt = dict(p_cur)
        m_nxt = dict(m_cur)
        p_nxt[f"P{100 + e}"] = f"N{e % 6}"                    # protein insert
        mover = f"P{(e * 5) % 24}"
        if mover in p_nxt:                                     # taxon move
            p_nxt[mover] = f"N{(int(p_nxt[mover][1:]) + 1) % 6}"
        victim = f"P{(e * 7) % 24}"
        p_nxt.pop(victim, None)                                # protein delete
        m_nxt[1000 + e] = (f"P{100 + e}", f"SIG{e % 9}", f"DB{(e % 9) % 3}")
        if (e * 3) % 70 in m_nxt:                              # signature change
            p_of = m_nxt[(e * 3) % 70][0]
            m_nxt[(e * 3) % 70] = (p_of, f"SIG{(e + 4) % 9}", f"DB{((e + 4) % 9) % 3}")
        m_nxt.pop((e * 11) % 70, None)                         # match delete

        dp = snapshot_delta_images(
            _p_df(spark, p_cur), _p_df(spark, p_nxt), ["protein_acc"], ["tax_id"]
        )
        dm = snapshot_delta_images(
            _m_df(spark, m_cur), _m_df(spark, m_nxt), ["match_id"],
            ["protein_acc", "signature_acc", "database"],
        )
        t0 = time.time()
        sup = maintain_taxon_supports(
            read(e), dp, dm, _p_df(spark, p_nxt),
            _m_df(spark, m_cur, with_id=False),
            _pp(spark), _ps(spark), _anc(spark),
        )
        write(sup, e + 1)
        walls.append(time.time() - t0)
        spark.catalog.clearCache()  # drop the epoch's persisted deltas
        p_cur, m_cur = p_nxt, m_nxt
        if e in checkpoints:
            got = _mart_rows(taxon_mart_from_supports(read(e + 1)))
            want = _mart_rows(_rebuild(spark, p_cur, m_cur))
            assert got == want, e

    third = len(walls) // 3
    early = statistics.median(walls[:third])
    late = statistics.median(walls[-third:])
    assert late < max(3.0 * early, early + 1.0), (early, late)


def test_mart_stream_equals_batch_rebuild(spark, tmp_path):
    """streaming/mart_stream.py — the warehouse mart maintained as a
    standing query: protein + match changelogs interleaved in one
    discriminated stream, drained over three micro-batches against
    COW-stored protein/match state; the rendered mart equals the full
    taxon_xrefs_mart rebuild of the final snapshot, and both COW
    stores resolve to the final snapshots."""
    from interpro7_dw_spark.streaming.mart_stream import (
        maintain_taxon_mart_stream,
        seed_mart_state,
        unify_changelogs,
    )
    from interpro7_dw_spark.streaming.minmax_stream import (
        _bucket_sources,
        _read_sources,
    )

    p_old = {f"P{i}": f"N{i % 6}" for i in range(24)}
    m_old = {j: (f"P{j % 24}", f"SIG{j % 9}", f"DB{(j % 9) % 3}") for j in range(70)}
    p_new = dict(p_old)
    p_new.pop("P3")
    p_new["P4"] = "N1"
    p_new["P5"] = "N2"
    p_new["P24"] = "N0"
    p_new["P25"] = "N5"
    m_new = dict(m_old)
    m_new.pop(10)
    m_new[11] = ("P11", "SIG0", "DB0")
    m_new[29] = ("P5", "SIG8", "DB2")
    m_new[100] = ("P25", "SIG1", "DB1")
    m_new[101] = ("P3", "SIG2", "DB2")

    dp = snapshot_delta_images(
        _p_df(spark, p_old), _p_df(spark, p_new), ["protein_acc"], ["tax_id"]
    )
    dm = snapshot_delta_images(
        _m_df(spark, m_old), _m_df(spark, m_new), ["match_id"],
        ["protein_acc", "signature_acc", "database"],
    )
    unified = unify_changelogs(dp, dm)
    src = str(tmp_path / "changes")
    # three micro-batch files; rows of BOTH tables interleave in each
    split = F.coalesce(F.col("match_id") % 3, F.ascii(F.col("protein_acc")) % 3)
    for part in range(3):
        unified.filter(split == part).coalesce(1).write.mode("append").parquet(src)

    state = str(tmp_path / "mart_state")
    n_buckets = 8
    seed_mart_state(
        spark, _p_df(spark, p_old), _m_df(spark, m_old),
        _pp(spark), _ps(spark), _anc(spark), state, n_buckets=n_buckets,
    )
    stream = (
        spark.readStream.schema(unified.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = maintain_taxon_mart_stream(
        spark, stream, state, _pp(spark), _ps(spark), _anc(spark),
        n_buckets=n_buckets, keep_last=2,
    )
    assert _mart_rows(out) == _mart_rows(_rebuild(spark, p_new, m_new))

    # the COW stores resolve to the final snapshots
    import os

    latest = max(
        int(p[1:].split("_e")[0])
        for p in os.listdir(state + "/mart")
        if p.startswith("v")
    )
    got_p = sorted(
        map(
            tuple,
            _read_sources(
                spark, state + "/proteins",
                _bucket_sources(spark, state + "/proteins", latest),
            ).collect(),
        )
    )
    assert got_p == sorted((k, v) for k, v in p_new.items())
    got_m = sorted(
        map(
            tuple,
            _read_sources(
                spark, state + "/matches",
                _bucket_sources(spark, state + "/matches", latest),
            )
            .select("match_id", "protein_acc", "signature_acc", "database")
            .collect(),
        )
    )
    assert got_m == sorted((k, *v) for k, v in m_new.items())


def test_mart_stream_time_travel_renders_old_release(spark, tmp_path):
    """read_taxon_mart_version: the maintained warehouse mart is
    readable AS OF any committed version — the seed version renders
    the OLD release's mart exactly (== full rebuild of the old
    snapshot), the latest renders the new one, an as-of-epoch read
    resolves to the newest version applied at or before that epoch,
    and an uncommitted version raises."""
    import pytest as _pytest

    from interpro7_dw_spark.streaming.mart_stream import (
        maintain_taxon_mart_stream,
        read_taxon_mart_version,
        seed_mart_state,
        unify_changelogs,
    )

    p_old = {f"P{i}": f"N{i % 6}" for i in range(18)}
    m_old = {j: (f"P{j % 18}", f"SIG{j % 9}", f"DB{(j % 9) % 3}") for j in range(40)}
    p_new = dict(p_old)
    p_new.pop("P2")
    p_new["P30"] = "N4"
    m_new = dict(m_old)
    m_new[100] = ("P30", "SIG3", "DB0")
    m_new.pop(7)

    dp = snapshot_delta_images(
        _p_df(spark, p_old), _p_df(spark, p_new), ["protein_acc"], ["tax_id"]
    )
    dm = snapshot_delta_images(
        _m_df(spark, m_old), _m_df(spark, m_new), ["match_id"],
        ["protein_acc", "signature_acc", "database"],
    )
    unified = unify_changelogs(dp, dm)
    src = str(tmp_path / "chg")
    unified.coalesce(1).write.parquet(src)
    state = str(tmp_path / "tt_state")
    seed_mart_state(
        spark, _p_df(spark, p_old), _m_df(spark, m_old),
        _pp(spark), _ps(spark), _anc(spark), state, n_buckets=4,
    )
    stream = spark.readStream.schema(unified.schema).parquet(src)
    maintain_taxon_mart_stream(
        spark, stream, state, _pp(spark), _ps(spark), _anc(spark), n_buckets=4
    )

    old_render = _mart_rows(read_taxon_mart_version(spark, state, version=0))
    assert old_render == _mart_rows(_rebuild(spark, p_old, m_old))
    new_render = _mart_rows(read_taxon_mart_version(spark, state))
    assert new_render == _mart_rows(_rebuild(spark, p_new, m_new))
    as_of = _mart_rows(read_taxon_mart_version(spark, state, epoch=0))
    assert as_of == new_render  # epoch 0 applied the whole single batch
    with _pytest.raises(KeyError):
        read_taxon_mart_version(spark, state, version=99)


def test_entry_mart_ivm_single_epoch_equals_full_rebuild(spark):
    """Entry-pyramid maintenance (the reference's worst release cost):
    assignment changelog (integration moves protein between entries,
    inserts, deletes) + protein-dim changelog (taxon moves, protein
    delete) folded into the five entry supports; the render — with
    the EC coverage filter + stem fallback and GO lists applied to
    MAINTAINED counts — equals entry_xrefs_mart's full rebuild of the
    new snapshot."""
    from interpro7_dw_spark.domain.mart_ivm import (
        ENTRY_SUPPORT_KEYS,
        entry_mart_from_supports,
        maintain_entry_supports,
        seed_entry_supports,
    )
    from interpro7_dw_spark.domain.marts import entry_xrefs_mart

    def pe_df(d, with_id=True):
        rows = sorted((k, *v) for k, v in d.items())
        df = spark.createDataFrame(
            rows, "pe_id long, protein_acc string, entry_acc string"
        )
        return df if with_id else df.drop("pe_id")

    def pec(s):
        return s.createDataFrame(
            [
                (f"P{i}", "1.2.3.4" if i % 3 == 0 else ("1.2.3.9" if i % 3 == 1 else "5.5.5.5"))
                for i in range(40)
            ],
            "protein_acc string, ec string",
        )

    def ego(s):
        return s.createDataFrame(
            [(f"IPR{e}", f"GO:00{e}") for e in range(4)]
            + [(f"IPR{e}", f"GO:01{(e + 1) % 4}") for e in range(4)],
            "entry_acc string, go_id string",
        )

    p_old = {f"P{i}": f"N{i % 6}" for i in range(24)}
    pe_old = {j: (f"P{j % 24}", f"IPR{j % 4}") for j in range(60)}
    p_new = dict(p_old)
    p_new.pop("P3")                      # protein deleted (taxa retract only)
    p_new["P4"] = "N1"                   # taxon move
    p_new["P25"] = "N5"                  # protein insert
    pe_new = dict(pe_old)
    pe_new.pop(10)                       # assignment delete
    pe_new[11] = ("P11", "IPR0")         # entry move (integration change)
    pe_new[100] = ("P25", "IPR2")        # new protein's assignment
    pe_new[101] = ("P3", "IPR1")         # assignment to a DELETED protein
                                         # (still counts: n_proteins ignores taxa)

    sup0 = seed_entry_supports(
        pe_df(pe_old, with_id=False), _p_df(spark, p_old),
        _pp(spark), _ps(spark), pec(spark),
    )
    dpe = snapshot_delta_images(
        pe_df(pe_old), pe_df(pe_new), ["pe_id"], ["protein_acc", "entry_acc"]
    )
    dp = snapshot_delta_images(
        _p_df(spark, p_old), _p_df(spark, p_new), ["protein_acc"], ["tax_id"]
    )
    sup1 = maintain_entry_supports(
        sup0, dpe, dp, _p_df(spark, p_new), pe_df(pe_old, with_id=False),
        _pp(spark), _ps(spark), pec(spark),
    )
    got = {
        r.entry_acc: tuple(r)[1:]
        for r in entry_mart_from_supports(sup1, entry_go=ego(spark)).collect()
    }
    want = {
        r.entry_acc: tuple(r)[1:]
        for r in entry_xrefs_mart(
            pe_df(pe_new, with_id=False), _p_df(spark, p_new),
            _pp(spark), _ps(spark),
            protein_ecs=pec(spark), entry_go=ego(spark),
        ).collect()
    }
    assert got == want
    for name in ENTRY_SUPPORT_KEYS:
        assert sup1[name].filter(F.col("n") <= 0).count() == 0, name
