"""Goldens for the clan alignment graph (G6) and the HMMER3 parser/
logo (X2)."""

from __future__ import annotations

import json
import math

from interpro7_dw_spark.domain.clans import clan_alignment_graph
from interpro7_dw_spark.domain.hmm import logo_from_probs, parse_hmm_models, parse_hmmer3_text


def test_clan_alignment_graph(spark):
    members = spark.createDataFrame(
        [("CL1", "PF1"), ("CL1", "PF2"), ("CL2", "PF3")],
        "clan_acc string, signature_acc string",
    )
    alignments = spark.createDataFrame(
        [
            ("PF2", "PF1", 1e-5),   # same clan, canonicalized to (PF1, PF2)
            ("PF1", "PF2", 1e-9),   # duplicate pair, better evalue -> min kept
            ("PF1", "PF3", 1e-9),   # cross-clan -> dropped
            ("PF1", "PF2", 0.5),    # over threshold -> dropped
            ("PFX", "PF1", 1e-9),   # query not in any clan -> dropped
        ],
        "query_acc string, target_acc string, evalue double",
    )
    got = [tuple(r) for r in clan_alignment_graph(members, alignments).collect()]
    assert got == [("CL1", "PF1", "PF2", 1e-9)]


# minimal 3-node DNA HMMER3 text; emission scores are -ln(p)
_LN = lambda p: f"{-math.log(p):.5f}"
_HMM_TEXT = "\n".join([
    "HMMER3/f [3.1b2 | February 2015]",
    "NAME  toy1",
    "ACC   TOY001",
    "LENG  3",
    "ALPH  DNA",
    "HMM          A        C        G        T",
    "            m->m     m->i     m->d     i->m     i->i     d->m     d->d",
    f"      1   {_LN(0.97)}  {_LN(0.01)}  {_LN(0.01)}  {_LN(0.01)}  1 - - - -",
    "          0.00000  0.00000  0.00000  0.00000",
    "          0.00000  *        *        0.00000  *        0.00000  *",
    f"      2   {_LN(0.25)}  {_LN(0.25)}  {_LN(0.25)}  {_LN(0.25)}  2 - - - -",
    "          0.00000  0.00000  0.00000  0.00000",
    "          0.00000  *        *        0.00000  *        0.00000  *",
    f"      3   {_LN(0.50)}  {_LN(0.50)}  *  *  3 - - - -",
    "          0.00000  0.00000  0.00000  0.00000",
    "          0.00000  *        *        0.00000  *        0.00000  *",
    "//",
])


def test_parse_hmmer3_text():
    m = parse_hmmer3_text(_HMM_TEXT)
    assert (m["name"], m["acc"], m["length"], m["alphabet"]) == ("toy1", "TOY001", 3, "dna")
    assert abs(m["match_probs"][0][0] - 0.97) < 1e-4     # A dominant at node 1
    assert all(abs(p - 0.25) < 1e-4 for p in m["match_probs"][1])
    assert m["match_probs"][2][2] == 0.0                 # '*' -> impossible


def test_logo_information_content():
    logo = logo_from_probs([[1.0, 0.0, 0.0, 0.0], [0.25] * 4], "dna")
    # certain position: IC = 2 bits, all height on A
    assert abs(logo["heights"][0]["A"] - 2.0) < 1e-9
    # uniform position: IC = 0
    assert all(abs(h) < 1e-9 for h in logo["heights"][1].values())


def test_parse_hmm_models_spark(spark):
    df = spark.createDataFrame([("m1", _HMM_TEXT)], "model_id string, hmm_text string")
    out = parse_hmm_models(df).collect()
    assert len(out) == 1
    r = out[0]
    assert r["name"] == "toy1" and r["length"] == 3
    logo = json.loads(r["logo"])
    assert len(logo["heights"]) == 3
    assert logo["heights"][0]["A"] > 1.5  # near-certain A dominates node 1
