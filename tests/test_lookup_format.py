"""Byte-level goldens for the X4 per-library lookup formatting
(reference interpro/lookup.py:151-418) and the protein2ipr flat file
(reference interpro/ftp/flatfiles.py:90-118)."""

from __future__ import annotations

import glob
import json

from pyspark.sql import functions as F

from interpro7_dw_spark.domain.lookup_format import format_lookup_matches

_SITES_T = (
    "array<struct<description string, numLocations int, siteLocations "
    "array<struct<res_start bigint, res_end bigint, residue string>>>>"
)


def _merged(spark, library, score=12.5, evalue=1e-7, seq_feature="SF1"):
    loc = F.struct(
        F.lit(10).cast("long").alias("start"),
        F.lit(90).cast("long").alias("end"),
        F.lit(1).cast("long").alias("hmmStart"),
        F.lit(80).cast("long").alias("hmmEnd"),
        F.lit(80).cast("long").alias("hmmLength"),
        F.lit("COMPLETE").alias("hmmBounds"),
        F.lit(8).cast("long").alias("envelopeStart"),
        F.lit(95).cast("long").alias("envelopeEnd"),
        F.lit(evalue).alias("evalue"),
        F.lit(score).alias("score"),
        F.array(
            F.struct(
                F.lit(10).cast("long").alias("start"),
                F.lit(90).cast("long").alias("end"),
                F.lit("CONTINUOUS").alias("dc_status"),
            )
        ).alias("location_fragments"),
        F.lit(seq_feature).alias("sequence_feature"),
        F.expr(f"CAST(array() AS {_SITES_T})").alias("sites"),
    )
    return spark.range(1).select(
        F.lit("UPI1").alias("upi"),
        F.lit("SIG1").alias("signature_acc"),
        F.lit("SIG1").alias("model_acc"),
        F.lit(library).alias("library"),
        F.lit("v1").alias("version"),
        F.lit(score).alias("score"),
        F.lit(evalue).alias("evalue"),
        F.array(loc).alias("locations"),
    )


def _one(spark, library):
    rows = format_lookup_matches(_merged(spark, library)).collect()
    return rows


def test_pfam_default_format_bytes(spark):
    (row,) = _one(spark, "Pfam")
    got = json.loads(row["match_json"])
    # reference dict order: signature, model-ac, score, evalue, locations
    assert list(got) == ["signature", "model-ac", "score", "evalue", "locations"]
    loc = got["locations"][0]
    assert list(loc) == [
        "start", "end", "hmmStart", "hmmEnd", "hmmLength", "evalue", "score",
        "location-fragments", "hmmBounds", "envelopeStart", "envelopeEnd",
    ]  # sites=False for Pfam
    assert loc["location-fragments"][0] == {
        "start": 10, "end": 90, "dc-status": "CONTINUOUS"
    }


def test_smart_drops_envelope_and_sites(spark):
    (row,) = _one(spark, "SMART")
    loc = json.loads(row["match_json"])["locations"][0]
    assert "envelopeStart" not in loc and "sites" not in loc
    assert "hmmBounds" in loc


def test_sfld_keeps_sites_drops_hmm_bounds(spark):
    (row,) = _one(spark, "SFLD")
    loc = json.loads(row["match_json"])["locations"][0]
    assert loc["sites"] == [] and "hmmBounds" not in loc


def test_panther_promotes_location_fields(spark):
    (row,) = _one(spark, "PANTHER")
    got = json.loads(row["match_json"])
    assert got["ancestralNode"] == "SF1"
    assert got["evalue"] == 1e-7 and got["score"] == 12.5
    assert "evalue" not in got["locations"][0]


def test_prints_renames_and_graphscan(spark):
    (row,) = _one(spark, "PRINTS")
    got = json.loads(row["match_json"])
    assert got["graphscan"] == "SF1"
    loc = got["locations"][0]
    assert loc["pvalue"] == 1e-7 and loc["motifNumber"] == 80


def test_prosite_cigar_and_score_flag(spark):
    (row,) = _one(spark, "PROSITE profiles")
    loc = json.loads(row["match_json"])["locations"][0]
    assert loc["cigarAlignment"] == "SF1" and loc["score"] == 12.5
    (row,) = _one(spark, "PROSITE patterns")
    loc = json.loads(row["match_json"])["locations"][0]
    assert "score" not in loc


def test_library_renames_and_drops(spark):
    (row,) = _one(spark, "FunFam")
    assert row["library"] == "CATH-FunFam"
    (row,) = _one(spark, "MobiDB Lite")
    assert row["library"] == "MobiDB-lite"
    assert json.loads(row["match_json"])["locations"][0]["sequence-feature"] == "SF1"
    assert _one(spark, "TMHMM") == []
    assert _one(spark, "SignalP_Euk") == []


def test_cdd_null_scores_kept_as_json_null(spark):
    df = _merged(spark, "CDD").withColumn("score", F.lit(None).cast("double"))
    (row,) = format_lookup_matches(df).collect()
    got = json.loads(row["match_json"])
    # json.dumps keeps None -> null; no match-level score key for CDD at all
    assert list(got) == ["signature", "model-ac", "locations"]
    assert got["locations"][0]["sites"] == []


def test_protein2ipr_file_bytes(spark, tmp_path):
    from interpro7_dw_spark.domain.flatfiles import protein2ipr_rows
    from interpro7_dw_spark.domain.pipeline import classify_matches
    from interpro7_dw_spark.sources.sinks import write_tsv

    matches = spark.createDataFrame(
        [
            # fragmented: start = first frag start, end = MAX frag end
            ("P2", "PF00001", None, 10, 90, "60-95-C,10-40-S", 7.0),
            ("P1", "PF00001", None, 1, 120, None, 10.0),
            ("P1", "MF00001", None, 5, 25, None, None),   # not integrated
        ],
        "protein_acc string, signature_acc string, model_acc string, "
        "pos_from long, pos_to long, fragments string, score double",
    )
    signatures = spark.createDataFrame(
        [
            ("PF00001", "Kinase dom", "kin", "Pfam", "domain", "hmm", "IPR000001"),
            ("MF00001", "Hamap reg", "ham", "HAMAP", "region", "rule", None),
        ],
        "signature_acc string, name string, short_name string, database string, "
        "type string, evidence string, entry_acc string",
    )
    entries = spark.createDataFrame(
        [("IPR000001", "Kinase", "kin", "Domain", None)],
        "entry_acc string, name string, short_name string, type string, parent_acc string",
    )
    out = str(tmp_path / "protein2ipr")
    write_tsv(
        protein2ipr_rows(classify_matches(matches, signatures), entries),
        out,
        include_header=False,
    )
    (part,) = glob.glob(out + "/part-*.txt")
    body = open(part).read()
    assert body == (
        "P1\tIPR000001\tKinase\tPF00001\t1\t120\n"
        "P2\tIPR000001\tKinase\tPF00001\t10\t95\n"
    )
