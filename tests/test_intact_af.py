"""Hand-traced goldens for the IntAct PSI-MI extraction (reference
intact.py:24-133) and the AlphaFold/BFVD model attachment
(alphafold.py:23-73, bfvd.py:9-36)."""

from __future__ import annotations

from interpro7_dw_spark.domain.alphafold import alphafold_models
from interpro7_dw_spark.domain.intact import interpro_interactions

_PSIMI_SCHEMA = (
    "ord bigint, ids_a string, ids_b string, aliases_a string, "
    "aliases_b string, publication_ids string, interaction_ids string, "
    "type_a string, type_b string, feature_a string, feature_b string"
)


def _row(
    ord,
    ids_a="uniprotkb:P00001",
    ids_b="uniprotkb:Q00002",
    aliases_a="psi-mi:some_name(display_long)|uniprotkb:gna(gene name)",
    aliases_b="uniprotkb:gnb(gene name)",
    publication_ids="pubmed:12345|mint:MINT-1",
    interaction_ids="intact:EBI-100|imex:IM-1",
    type_a='psi-mi:"MI:0326"(protein)',
    type_b='psi-mi:"MI:0328"(small molecule)',
    feature_a="binding region:IPR000001(text)",
    feature_b="-",
):
    return (
        ord, ids_a, ids_b, aliases_a, aliases_b, publication_ids,
        interaction_ids, type_a, type_b, feature_a, feature_b,
    )


def test_intact_extraction_rules(spark):
    rows = [
        # baseline: survives; display_long name upper-cased for A,
        # gene-name fallback for B (intact.py:106-113)
        _row(1),
        # two accessions across both feature columns -> two entries
        # (intact.py:35-40)
        _row(
            2,
            interaction_ids="intact:EBI-200",
            feature_a="x:IPR000001|y:IPR000002",
            feature_b="z:IPR000002",
        ),
        # no IPR anywhere -> skipped entirely (intact.py:40-41)
        _row(3, feature_a="mutation:-", feature_b="-"),
        # no intact: id -> dropped by the all-fields filter
        # (intact.py:56-66)
        _row(4, interaction_ids="imex:IM-2"),
        # multi-valued type -> type is None -> dropped
        # (intact.py:115-120)
        _row(5, type_a='psi-mi:"MI:1"(a)|psi-mi:"MI:2"(b)'),
        # no pubmed -> dropped (intact.py:123-125)
        _row(6, publication_ids="doi:10.1/x"),
        # no uniprotkb interactor B accession -> dropped
        _row(7, ids_b='chebi:"CHEBI:1"'),
        # same (entry, interaction) as ord=1 but later -> overwrites
        # (dict last-wins, intact.py:82-86)
        _row(8, publication_ids="pubmed:99999"),
    ]
    out = interpro_interactions(
        spark.createDataFrame(rows, _PSIMI_SCHEMA)
    )
    got = {
        (r.entry_acc, r.intact_id): r for r in out.collect()
    }
    assert set(got) == {
        ("IPR000001", "EBI-100"),
        ("IPR000001", "EBI-200"),
        ("IPR000002", "EBI-200"),
    }
    winner = got[("IPR000001", "EBI-100")]
    assert winner.pubmed_id == 99999  # ord=8 beat ord=1
    assert winner.name_1 == "SOME_NAME"  # display_long, upper-cased
    assert winner.name_2 == "gnb"  # uniprotkb fallback, case kept
    assert winner.type_1 == "protein"
    assert winner.type_2 == "small molecule"
    assert winner.acc_1 == "P00001" and winner.acc_2 == "Q00002"


def test_alphafold_fragment_drop_and_sort(spark):
    preds = spark.createDataFrame(
        [
            ("P1", "AF-P1-F1", 91.5),
            ("P2", "AF-P2-F2", 70.0),  # fragmented: two models
            ("P2", "AF-P2-F1", 85.0),
            ("P3", "AF-P3-F1", 60.0),  # not in the key set
        ],
        "protein_acc string, model_id string, score double",
    )
    proteins = spark.createDataFrame(
        [("P1",), ("P2",)], "protein_acc string"
    )

    # default mode: fragmented P2 dropped (alphafold.py:62-65),
    # unknown P3 dropped (KeyError-continue, alphafold.py:50-57)
    kept = alphafold_models(preds, proteins).collect()
    assert [(r.protein_acc, r.models_json) for r in kept] == [
        ("P1", '[["AF-P1-F1",91.5]]')
    ]

    # keep_fragments: P2 kept with models ascending by score
    # (alphafold.py:71-73)
    full = {
        r.protein_acc: r
        for r in alphafold_models(
            preds, proteins, keep_fragments=True
        ).collect()
    }
    assert full["P2"].n_models == 2
    assert full["P2"].models_json == '[["AF-P2-F2",70.0],["AF-P2-F1",85.0]]'
