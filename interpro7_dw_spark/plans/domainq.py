"""Domain-pipeline catalog entries: run the InterPro match-merge
pipeline (domain/pipeline.py — the reference's X1 task) over
match-shaped data synthesized deterministically from the star schema,
so its throughput shows up in bench and its correctness under the
differ gate. The repr-selection DFS is replayed in DuckDB as
subset-mask enumeration and the condensation as a list_reduce fold
(shared _PIPELINE_CTES below), so BOTH the numeric summary AND the
full byte-exact locations-JSON output carry value oracles; goldens +
property tests live in tests/test_domain.py.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..domain.pipeline import REPR_DOM_DATABASES, merge_protein_matches
from ..domain.uniparc import lookup_site_rows
from .spec import QuerySpec, register, t

_SIG_DBS = REPR_DOM_DATABASES + ["panther", "hamap"]
_SIG_TYPES = ["domain"] * len(REPR_DOM_DATABASES) + ["family", "region"]


def synth_matches(spark: SparkSession, sf: str):
    """lineitem -> match-shaped rows: order = protein, part = signature,
    positions derived from line number/quantity (deterministic)."""
    li = t(spark, sf, "lineitem")
    pos_from = (F.col("l_partkey") * 13 + F.col("l_linenumber") * 7) % 400 + 1
    return li.select(
        F.concat(F.lit("P"), F.col("l_orderkey")).alias("protein_acc"),
        F.concat(F.lit("SIG"), F.col("l_partkey") % 200).alias("signature_acc"),
        F.lit(None).cast("string").alias("model_acc"),
        pos_from.cast("long").alias("pos_from"),
        (pos_from + (F.col("l_quantity") * 3).cast("long") + 10).alias("pos_to"),
        F.lit(None).cast("string").alias("fragments"),
        F.col("l_discount").alias("score"),
    )


def synth_signatures(spark: SparkSession, sf: str):
    n_dbs = len(_SIG_DBS)
    idx = F.col("sig_id") % n_dbs
    db = F.lit(None).cast("string")
    typ = F.lit(None).cast("string")
    for i, (d, ty) in enumerate(zip(_SIG_DBS, _SIG_TYPES)):
        db = F.when(idx == i, d).otherwise(db)
        typ = F.when(idx == i, ty).otherwise(typ)
    return spark.range(200).select(
        F.concat(F.lit("SIG"), F.col("id")).alias("signature_acc"),
        F.concat(F.lit("name"), F.col("id")).alias("name"),
        F.concat(F.lit("sn"), F.col("id")).alias("short_name"),
        F.col("id").alias("sig_id"),
    ).select(
        "signature_acc",
        "name",
        "short_name",
        db.alias("database"),
        typ.alias("type"),
        F.lit("hmm").alias("evidence"),
        # every third signature integrated into an InterPro entry
        F.when(F.col("sig_id") % 3 == 0,
               F.concat(F.lit("IPR"), F.col("sig_id") % 40)).alias("entry_acc"),
    )


def synth_entries(spark: SparkSession, sf: str):
    return spark.range(40).select(
        F.concat(F.lit("IPR"), F.col("id")).alias("entry_acc"),
        F.concat(F.lit("Entry "), F.col("id")).alias("name"),
        F.concat(F.lit("entry_"), F.col("id")).alias("short_name"),
        F.lit("Domain").alias("type"),
        F.lit(None).cast("string").alias("parent_acc"),
    )


# Shared DuckDB replay of the full merge pipeline (classify -> repr-
# selection DFS as subset-mask enumeration -> entry condensation fold);
# consumed by BOTH the domain_match_summary numeric oracle and the
# z_domain_merge_matches byte-exact JSON oracle.
_PIPELINE_CTES = """m0 AS (
  SELECT 'P' || l_orderkey AS protein_acc,
         l_partkey % 200 AS sig_num,
         'SIG' || (l_partkey % 200) AS signature_acc,
         CAST((l_partkey * 13 + l_linenumber * 7) % 400 + 1 AS BIGINT) AS s,
         CAST((l_partkey * 13 + l_linenumber * 7) % 400 + 1
              + CAST(l_quantity * 3 AS BIGINT) + 10 AS BIGINT) AS e,
         CAST(round(l_discount * 100) AS BIGINT) AS score_cents,
         l_discount AS score
  FROM lineitem
),
m AS (
  SELECT *,
    ['pfam','cdd','profile','smart','ncbifam','cathgene3d','ssf','panther','hamap'][CAST(sig_num % 9 AS INT) + 1] AS db,
    ['domain','domain','domain','domain','domain','domain','domain','family','region'][CAST(sig_num % 9 AS INT) + 1] AS typ,
    CASE WHEN sig_num % 9 <= 6 THEN 'domain'
         WHEN sig_num % 9 = 7 THEN 'family'
         ELSE 'region' END AS klass,
    CASE WHEN sig_num % 9 <= 6 THEN CAST(sig_num % 9 AS INT)
         WHEN sig_num % 9 = 7 THEN 1 END AS rnk,
    CASE WHEN sig_num % 3 = 0 THEN 'IPR' || (sig_num % 40) END AS entry_acc,
    row_number() OVER (PARTITION BY protein_acc
                       ORDER BY signature_acc, s, e,
                                score ASC NULLS FIRST) AS domain_id
  FROM m0
),
-- chain-group domains/families per (protein, klass); a row starts a new
-- group when its start exceeds the running max end (touch = same group)
chain AS (
  SELECT *,
    CASE WHEN s <= max(e) OVER (PARTITION BY protein_acc, klass
                                ORDER BY s, e, domain_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         THEN 0 ELSE 1 END AS brk
  FROM m WHERE klass IN ('domain','family')
),
grp AS (
  SELECT *, sum(brk) OVER (PARTITION BY protein_acc, klass ORDER BY s, e, domain_id) AS gid
  FROM chain
),
cand AS (
  SELECT *, e - s + 1 AS sz,
    row_number() OVER (PARTITION BY protein_acc, klass, gid
                       ORDER BY (e - s + 1) DESC, rnk, domain_id) - 1 AS ci
  FROM grp
),
cand20 AS (
  SELECT *, count(*) OVER (PARTITION BY protein_acc, klass, gid) AS n
  FROM cand WHERE ci < 20
),
singles AS (
  SELECT protein_acc, domain_id FROM cand20 WHERE n = 1
),
multi AS (SELECT DISTINCT protein_acc, klass, gid, n FROM cand20 WHERE n > 1),
-- DFS replay: enumerate candidate subsets as bitmasks, candidate ci at
-- bit (n-1-ci) so larger mask == earlier include-first DFS visit
masks AS (
  SELECT g.protein_acc, g.klass, g.gid, g.n, gs.mask
  FROM multi g, LATERAL (
    SELECT unnest(generate_series(1, (1::BIGINT << g.n) - 1)) AS mask
  ) gs
),
conf AS (
  SELECT a.protein_acc, a.klass, a.gid, a.ci AS i, b.ci AS j
  FROM cand20 a
  JOIN cand20 b ON a.protein_acc = b.protein_acc AND a.klass = b.klass
               AND a.gid = b.gid AND a.ci < b.ci
  WHERE least(a.e, b.e) - greatest(a.s, b.s) + 1 > 0
    AND least(a.e, b.e) - greatest(a.s, b.s) + 1 >= least(a.sz, b.sz) * 0.3
),
invalid AS (
  SELECT DISTINCT mk.protein_acc, mk.klass, mk.gid, mk.mask
  FROM masks mk
  JOIN conf c ON mk.protein_acc = c.protein_acc AND mk.klass = c.klass AND mk.gid = c.gid
  WHERE ((mk.mask >> (mk.n - 1 - c.i)) & 1) = 1
    AND ((mk.mask >> (mk.n - 1 - c.j)) & 1) = 1
),
valid_mm AS (
  SELECT mk.protein_acc, mk.klass, mk.gid, mk.mask, mk.n,
         c.ci, c.s, c.e, c.rnk, c.domain_id
  FROM masks mk
  JOIN cand20 c ON mk.protein_acc = c.protein_acc AND mk.klass = c.klass AND mk.gid = c.gid
  WHERE ((mk.mask >> (mk.n - 1 - c.ci)) & 1) = 1
    AND NOT EXISTS (SELECT 1 FROM invalid iv
                    WHERE iv.protein_acc = mk.protein_acc AND iv.klass = mk.klass
                      AND iv.gid = mk.gid AND iv.mask = mk.mask)
),
-- residue coverage of a subset: adjacency-merged islands (gap of 1 merges)
isl AS (
  SELECT *,
    CASE WHEN s <= max(e) OVER (PARTITION BY protein_acc, klass, gid, mask
                                ORDER BY s, e, domain_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
         THEN 0 ELSE 1 END AS brk
  FROM valid_mm
),
isl2 AS (
  SELECT *, sum(brk) OVER (PARTITION BY protein_acc, klass, gid, mask
                           ORDER BY s, e, domain_id) AS iid
  FROM isl
),
cov AS (
  SELECT protein_acc, klass, gid, mask,
         sum(iend - istart + 1) AS cov, sum(pf) AS pfams
  FROM (
    SELECT protein_acc, klass, gid, mask, iid,
           min(s) AS istart, max(e) AS iend,
           sum(CASE WHEN rnk = 0 THEN 1 ELSE 0 END) AS pf
    FROM isl2
    GROUP BY protein_acc, klass, gid, mask, iid
  )
  GROUP BY protein_acc, klass, gid, mask
),
best AS (
  SELECT protein_acc, klass, gid, mask
  FROM (
    SELECT *, row_number() OVER (PARTITION BY protein_acc, klass, gid
                                 ORDER BY cov DESC, pfams DESC, mask DESC) AS rn
    FROM cov
  ) WHERE rn = 1
),
selected AS (
  SELECT v.protein_acc, v.domain_id
  FROM valid_mm v JOIN best b
    ON v.protein_acc = b.protein_acc AND v.klass = b.klass
   AND v.gid = b.gid AND v.mask = b.mask
),
reprs AS (
  SELECT * FROM singles UNION ALL SELECT * FROM selected
),
ent AS (
  SELECT protein_acc, entry_acc,
         list_sort(list({s: s, e: e})) AS spans
  FROM m WHERE entry_acc IS NOT NULL
  GROUP BY protein_acc, entry_acc
),
-- entry condensation fold (swallow contained; extend on >=10 pct overlap
-- of the shorter span; else emit) — mirrors condense_locations_col
entfold AS (
  SELECT protein_acc, entry_acc,
    list_reduce(
      list_transform(spans, x -> {done: CAST([] AS STRUCT(s BIGINT, e BIGINT)[]), cs: x.s, ce: x.e}),
      (acc, x) -> CASE
        WHEN x.ce <= acc.ce THEN acc
        WHEN x.cs <= acc.ce
             AND least(acc.ce, x.ce) - greatest(acc.cs, x.cs) + 1
                 >= (least(acc.ce - acc.cs, x.ce - x.cs) + 1) * 0.1
          THEN {done: acc.done, cs: acc.cs, ce: x.ce}
        ELSE {done: list_append(acc.done, {s: acc.cs, e: acc.ce}), cs: x.cs, ce: x.ce}
      END
    ) AS st
  FROM ent
),
condensed AS (
  SELECT protein_acc, entry_acc,
         list_append(st.done, {s: st.cs, e: st.ce}) AS condensed
  FROM entfold
)"""


register(QuerySpec(
    name="z_domain_merge_matches",
    tags=("X1", "G5", "W3", "F1", "J2"),
    description="Full InterPro match-merge pipeline (classify -> repr "
    "selection -> signature grouping -> entry condensation) on synthesized "
    "matches, BYTE-EXACT including the rendered locations JSON: the oracle "
    "replays the repr-selection DFS (subset-mask enumeration) and the "
    "condensation fold, then assembles the identical JSON strings — key "
    "order, dc-status hyphenation, true/false/null literals, and double "
    "score rendering all reproduced (discount-grid doubles render "
    "identically under Java shortest-repr and DuckDB VARCHAR casts). "
    "In-group location order replays Spark's array_sort struct comparator: "
    "(start, end, fragments==(start,end), representative, model=const, "
    "score) -> ORDER BY s, e, repr, score.",
    build=lambda spark, sf: merge_protein_matches(
        synth_matches(spark, sf), synth_signatures(spark, sf), synth_entries(spark, sf)
    ),
    oracle="WITH " + _PIPELINE_CTES + """,
sigloc AS (
  SELECT m.protein_acc, m.signature_acc, m.db, m.typ, m.entry_acc,
         m.s, m.e, m.score,
         (r.domain_id IS NOT NULL) AS repr
  FROM m LEFT JOIN reprs r
    ON m.protein_acc = r.protein_acc AND m.domain_id = r.domain_id
),
sigjson AS (
  SELECT protein_acc, signature_acc AS accession, db AS source_database,
         typ AS "type", any_value(entry_acc) AS entry_acc,
         '[' || string_agg(
           '{"fragments":[{"start":' || CAST(s AS VARCHAR)
           || ',"end":' || CAST(e AS VARCHAR)
           || ',"dc-status":"CONTINUOUS"}],"representative":'
           || CASE WHEN repr THEN 'true' ELSE 'false' END
           || ',"model":"' || signature_acc || '","score":'
           || CAST(score AS VARCHAR) || '}',
           ',' ORDER BY s, e, repr, score) || ']' AS locations
  FROM sigloc
  GROUP BY protein_acc, signature_acc, db, typ
),
entjson AS (
  SELECT protein_acc, entry_acc AS accession, 'INTERPRO' AS source_database,
         'Domain' AS "type", entry_acc,
         '[' || array_to_string(list_transform(condensed, x ->
           '{"fragments":[{"start":' || CAST(x.s AS VARCHAR)
           || ',"end":' || CAST(x.e AS VARCHAR)
           || ',"dc-status":"CONTINUOUS"}],"representative":false,"model":null,"score":null}'
         ), ',') || ']' AS locations
  FROM condensed
)
SELECT * FROM sigjson
UNION ALL
SELECT * FROM entjson
    """,
))


_LOC_SCHEMA = (
    "array<struct<fragments: array<struct<start: bigint, `end`: bigint, "
    "`dc-status`: string>>, representative: boolean, model: string, score: double>>"
)


def _domain_match_summary(spark: SparkSession, sf: str):
    """Numeric projection of the FULL merge pipeline output — parsed
    back from the emitted locations JSON, so JSON shape, representative
    flags, per-signature grouping and entry condensation all feed the
    hash. Integer-only measures sidestep float/JSON-format brittleness."""
    merged = merge_protein_matches(
        synth_matches(spark, sf), synth_signatures(spark, sf), synth_entries(spark, sf)
    )
    # parse the JSON once into a column — repeating from_json per
    # measure re-parses the string five times (measured 6x slower)
    return merged.withColumn("locs", F.from_json("locations", _LOC_SCHEMA)).select(
        "protein_acc",
        "accession",
        "source_database",
        "type",
        "entry_acc",
        F.expr("cast(size(locs) as bigint)").alias("n_locations"),
        F.expr("aggregate(locs, 0L, (acc, l) -> acc + if(l.representative, 1L, 0L))").alias(
            "n_repr"
        ),
        F.expr(
            "aggregate(locs, 0L, (acc, l) -> acc + aggregate(l.fragments, 0L, (a, f) -> a + f.start))"
        ).alias("frag_start_sum"),
        F.expr(
            "aggregate(locs, 0L, (acc, l) -> acc + aggregate(l.fragments, 0L, (a, f) -> a + f.end))"
        ).alias("frag_end_sum"),
        F.expr(
            "aggregate(locs, 0L, (acc, l) -> acc + coalesce(cast(round(l.score * 100) as bigint), 0L))"
        ).alias("score_cents_sum"),
    )


register(QuerySpec(
    name="domain_match_summary",
    tags=("X1", "G5", "W3", "F1", "J2", "A9"),
    description="Value-level oracle for the X1 match-merge pipeline "
    "(reference interpro/oracle/matches.py:287-393): the representative-"
    "selection DFS (matches.py:106-232) is replayed in DuckDB as "
    "conflict-free subset-mask enumeration — the include-first DFS "
    "tie-break equals argmax(coverage, pfam_count, mask) with candidate 0 "
    "as the most significant bit — and entry condensation (matches.py:"
    "60-103) as a list_reduce fold. Single-fragment fixture keeps the "
    "mask space <= 2^7 per chain-group.",
    build=_domain_match_summary,
    oracle="WITH " + _PIPELINE_CTES + """,
sigsum AS (
  SELECT m.protein_acc, m.signature_acc AS accession, m.db AS source_database,
         m.typ AS "type", any_value(m.entry_acc) AS entry_acc,
         count(*) AS n_locations,
         CAST(sum(CASE WHEN r.domain_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_repr,
         CAST(sum(m.s) AS BIGINT) AS frag_start_sum,
         CAST(sum(m.e) AS BIGINT) AS frag_end_sum,
         CAST(sum(m.score_cents) AS BIGINT) AS score_cents_sum
  FROM m LEFT JOIN reprs r ON m.protein_acc = r.protein_acc AND m.domain_id = r.domain_id
  GROUP BY m.protein_acc, m.signature_acc, m.db, m.typ
),
entsum AS (
  SELECT protein_acc, entry_acc AS accession, 'INTERPRO' AS source_database,
         'Domain' AS "type", entry_acc,
         CAST(len(condensed) AS BIGINT) AS n_locations,
         0::BIGINT AS n_repr,
         CAST(list_reduce(list_transform(condensed, x -> x.s), (a, b) -> a + b) AS BIGINT) AS frag_start_sum,
         CAST(list_reduce(list_transform(condensed, x -> x.e), (a, b) -> a + b) AS BIGINT) AS frag_end_sum,
         0::BIGINT AS score_cents_sum
  FROM condensed
)
SELECT * FROM sigsum
UNION ALL
SELECT * FROM entsum
    """,
))


def _flat_protein2ipr(spark: SparkSession, sf: str):
    from ..domain.flatfiles import protein2ipr_rows
    from ..domain.pipeline import classify_matches

    classified = classify_matches(synth_matches(spark, sf), synth_signatures(spark, sf))
    return protein2ipr_rows(classified, synth_entries(spark, sf))


register(QuerySpec(
    name="flat_protein2ipr",
    tags=("X1", "S16", "O1", "J2", "F1"),
    description="protein2ipr.dat rows (reference interpro/ftp/flatfiles.py:"
    "90-118): classify matches, keep integrated ones, emit one line per "
    "location with the entry name broadcast-joined and span = (first "
    "fragment start, max fragment end). SURVEY Phase-1 acceptance.",
    build=_flat_protein2ipr,
    oracle="""
        SELECT 'P' || l_orderkey AS protein_acc,
               'IPR' || ((l_partkey % 200) % 40) AS entry_acc,
               'Entry ' || ((l_partkey % 200) % 40) AS entry_name,
               'SIG' || (l_partkey % 200) AS signature_acc,
               ((l_partkey * 13 + l_linenumber * 7) % 400 + 1) AS pos_start,
               ((l_partkey * 13 + l_linenumber * 7) % 400 + 1)
                 + CAST(l_quantity * 3 AS BIGINT) + 10 AS pos_end
        FROM lineitem
        WHERE (l_partkey % 200) % 3 = 0
    """,
))


_LOOKUP_LIBS = [
    "AntiFam", "CATH-Gene3D", "CDD", "COILS", "FunFam", "HAMAP",
    "MobiDB Lite", "NCBIFAM", "PANTHER", "Pfam", "Phobius", "PIRSF",
    "PIRSR", "PRINTS", "PROSITE patterns", "PROSITE profiles", "SFLD",
    "SMART", "SUPERFAMILY", "SignalP_Euk", "SignalP_Gram_positive",
    "SignalP_Gram_negative", "TMHMM",
]

_SITES_T = (
    "array<struct<description string, numLocations int, siteLocations "
    "array<struct<res_start bigint, res_end bigint, residue string>>>>"
)


def synth_lookup_matches(spark: SparkSession, sf: str):
    """orders -> merge_uniparc_matches-shaped rows covering all 23
    analysis libraries (including the four the formatter must drop)."""
    start = (F.col("o_orderkey") % 300 + 1).cast("long")
    end = start + 50
    lib = F.element_at(
        F.array(*[F.lit(x) for x in _LOOKUP_LIBS]),
        (F.col("o_orderkey") % len(_LOOKUP_LIBS) + 1).cast("int"),
    )
    loc = F.struct(
        start.alias("start"),
        end.alias("end"),
        F.lit(1).cast("long").alias("hmmStart"),
        F.lit(50).cast("long").alias("hmmEnd"),
        F.lit(50).cast("long").alias("hmmLength"),
        F.lit("COMPLETE").alias("hmmBounds"),
        start.alias("envelopeStart"),
        end.alias("envelopeEnd"),
        F.lit(1e-5).alias("evalue"),
        F.col("o_totalprice").alias("score"),
        F.array(
            F.struct(
                start.alias("start"), end.alias("end"),
                F.lit("CONTINUOUS").alias("dc_status"),
            )
        ).alias("location_fragments"),
        F.concat_ws("", F.lit("SF"), F.col("o_orderkey") % 7).alias("sequence_feature"),
        F.expr(f"CAST(array() AS {_SITES_T})").alias("sites"),
    )
    sig = F.concat_ws("", F.lit("SIG"), F.col("o_orderkey") % 50)
    return t(spark, sf, "orders").select(
        F.concat_ws("", F.lit("UPI"), F.col("o_custkey")).alias("upi"),
        sig.alias("signature_acc"),
        sig.alias("model_acc"),
        lib.alias("library"),
        F.lit("v1").alias("version"),
        F.col("o_totalprice").alias("score"),
        F.lit(1e-5).alias("evalue"),
        F.array(loc).alias("locations"),
    )


def _lookup_match_json(spark: SparkSession, sf: str):
    from ..domain.lookup_format import format_lookup_matches

    formatted = format_lookup_matches(synth_lookup_matches(spark, sf))
    return (
        formatted.select(
            "library",
            F.array_join(
                F.array_sort(F.json_object_keys("match_json")), ","
            ).alias("match_keys"),
            F.array_join(
                F.array_sort(
                    F.json_object_keys(F.get_json_object("match_json", "$.locations[0]"))
                ),
                ",",
            ).alias("loc_keys"),
        )
        .groupBy("library", "match_keys", "loc_keys")
        .agg(F.count(F.lit(1)).alias("n"))
    )


register(QuerySpec(
    name="lookup_match_json",
    tags=("X4", "F8", "F9"),
    description="X4 per-library lookup formatting (reference interpro/"
    "lookup.py:151-418): the 17-way when-chain dispatch, library "
    "canonicalization (FunFam->CATH-FunFam, MobiDB Lite->MobiDB-lite), "
    "SignalP*/TMHMM drops, and per-library JSON shapes — verified by "
    "extracting the exact key set each branch emits at match and location "
    "level (byte-level JSON goldens in tests/test_lookup_format.py).",
    build=_lookup_match_json,
    oracle="""
        WITH raw AS (
          SELECT (['AntiFam','CATH-Gene3D','CDD','COILS','FunFam','HAMAP',
                   'MobiDB Lite','NCBIFAM','PANTHER','Pfam','Phobius','PIRSF',
                   'PIRSR','PRINTS','PROSITE patterns','PROSITE profiles','SFLD',
                   'SMART','SUPERFAMILY','SignalP_Euk','SignalP_Gram_positive',
                   'SignalP_Gram_negative','TMHMM'])[(o_orderkey % 23) + 1] AS lib
          FROM orders
        ), canon AS (
          SELECT CASE lib WHEN 'FunFam' THEN 'CATH-FunFam'
                          WHEN 'MobiDB Lite' THEN 'MobiDB-lite'
                          ELSE lib END AS library
          FROM raw
          WHERE lib NOT IN ('SignalP_Euk', 'SignalP_Gram_positive',
                            'SignalP_Gram_negative', 'TMHMM')
        )
        SELECT library,
               CASE
                 WHEN library IN ('AntiFam','CATH-FunFam','CATH-Gene3D','NCBIFAM',
                                  'Pfam','PIRSF','PIRSR','SFLD','SMART')
                   THEN 'evalue,locations,model-ac,score,signature'
                 WHEN library = 'PANTHER'
                   THEN 'ancestralNode,evalue,locations,model-ac,score,signature'
                 WHEN library = 'PRINTS'
                   THEN 'evalue,graphscan,locations,model-ac,signature'
                 ELSE 'locations,model-ac,signature'
               END AS match_keys,
               CASE
                 WHEN library IN ('AntiFam','CATH-FunFam','CATH-Gene3D','NCBIFAM',
                                  'Pfam','PIRSF')
                   THEN 'end,envelopeEnd,envelopeStart,evalue,hmmBounds,hmmEnd,hmmLength,hmmStart,location-fragments,score,start'
                 WHEN library IN ('PIRSR','SFLD')
                   THEN 'end,envelopeEnd,envelopeStart,evalue,hmmEnd,hmmLength,hmmStart,location-fragments,score,sites,start'
                 WHEN library = 'SMART'
                   THEN 'end,evalue,hmmBounds,hmmEnd,hmmLength,hmmStart,location-fragments,score,start'
                 WHEN library = 'CDD'
                   THEN 'end,evalue,location-fragments,score,sites,start'
                 WHEN library IN ('COILS','Phobius')
                   THEN 'end,location-fragments,start'
                 WHEN library = 'MobiDB-lite'
                   THEN 'end,location-fragments,sequence-feature,start'
                 WHEN library = 'PANTHER'
                   THEN 'end,envelopeEnd,envelopeStart,hmmBounds,hmmEnd,hmmLength,hmmStart,location-fragments,start'
                 WHEN library = 'PRINTS'
                   THEN 'end,location-fragments,motifNumber,pvalue,score,start'
                 WHEN library IN ('HAMAP','PROSITE profiles')
                   THEN 'cigarAlignment,end,location-fragments,score,start'
                 WHEN library = 'PROSITE patterns'
                   THEN 'cigarAlignment,end,location-fragments,start'
                 WHEN library = 'SUPERFAMILY'
                   THEN 'end,evalue,hmmLength,location-fragments,start'
               END AS loc_keys,
               count(*) AS n
        FROM canon
        GROUP BY 1, 2, 3
    """,
))


def _search_documents(spark: SparkSession, sf: str):
    from ..domain.documents import relationship_documents

    orders = t(spark, sf, "orders")
    proteins = t(spark, sf, "customer").select(
        F.col("c_custkey").cast("string").alias("protein_acc"),
        F.col("c_nationkey").cast("string").alias("tax_id"),
    )
    protein_entries = orders.select(
        F.col("o_custkey").cast("string").alias("protein_acc"),
        F.col("o_orderpriority").alias("entry_acc"),
    ).distinct()
    # "chains" = order years before 1997; later-only customers fall
    # back to chain-less docs, and 1997+ years become structure leftovers
    protein_chains = orders.filter(F.col("o_orderdate") < "1997-01-01").select(
        F.col("o_custkey").cast("string").alias("protein_acc"),
        F.year("o_orderdate").cast("string").alias("pdb_chain"),
    ).distinct()
    entries = orders.select(F.col("o_orderpriority").alias("entry_acc")).distinct()
    structures = orders.select(F.year("o_orderdate").cast("string").alias("pdb_chain")).distinct()
    taxa = t(spark, sf, "nation").select(F.col("n_nationkey").cast("string").alias("tax_id"))
    return relationship_documents(
        proteins, protein_entries, protein_chains, entries, structures, taxa
    )


register(QuerySpec(
    name="search_documents",
    tags=("J9", "J5", "U1"),
    description="Search-document fan-out: (protein x entry x chain) cross "
    "product with fallback docs + anti-join leftovers (reference ES export, "
    "interpro/elastic/export.py:576-701,129-284).",
    build=_search_documents,
    oracle="""
        WITH pe AS (
          SELECT DISTINCT CAST(o_custkey AS VARCHAR) AS protein_acc,
                 o_orderpriority AS entry_acc FROM orders
        ), pc AS (
          SELECT DISTINCT CAST(o_custkey AS VARCHAR) AS protein_acc,
                 CAST(year(o_orderdate) AS VARCHAR) AS pdb_chain
          FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'
        ), fan AS (
          SELECT CAST(c.c_custkey AS VARCHAR) AS protein_acc,
                 pe.entry_acc, pc.pdb_chain,
                 CAST(c.c_nationkey AS VARCHAR) AS tax_id,
                 'relationship' AS doc_type
          FROM customer c
          LEFT JOIN pe ON pe.protein_acc = CAST(c.c_custkey AS VARCHAR)
          LEFT JOIN pc ON pc.protein_acc = CAST(c.c_custkey AS VARCHAR)
        ), lo_entry AS (
          SELECT NULL AS protein_acc, e.entry_acc, NULL AS pdb_chain,
                 NULL AS tax_id, 'entry' AS doc_type
          FROM (SELECT DISTINCT o_orderpriority AS entry_acc FROM orders) e
          WHERE e.entry_acc NOT IN (SELECT DISTINCT entry_acc FROM fan WHERE entry_acc IS NOT NULL)
        ), lo_struct AS (
          SELECT NULL, NULL, s.pdb_chain, NULL, 'structure'
          FROM (SELECT DISTINCT CAST(year(o_orderdate) AS VARCHAR) AS pdb_chain FROM orders) s
          WHERE s.pdb_chain NOT IN (SELECT DISTINCT pdb_chain FROM fan WHERE pdb_chain IS NOT NULL)
        ), lo_tax AS (
          SELECT NULL, NULL, NULL, CAST(n_nationkey AS VARCHAR), 'taxon'
          FROM nation
          WHERE CAST(n_nationkey AS VARCHAR) NOT IN (SELECT DISTINCT tax_id FROM fan WHERE tax_id IS NOT NULL)
        ), docs AS (
          SELECT * FROM fan
          UNION ALL SELECT * FROM lo_entry
          UNION ALL SELECT * FROM lo_struct
          UNION ALL SELECT * FROM lo_tax
        )
        SELECT concat_ws('-', coalesce(protein_acc, ''), coalesce(entry_acc, ''),
                         coalesce(pdb_chain, ''), coalesce(tax_id, '')) AS doc_id,
               protein_acc, entry_acc, pdb_chain, tax_id, doc_type
        FROM docs
    """,
))


# --- IDA (domain-architecture) search documents ----------------------

def _ida_documents(spark: SparkSession, sf: str):
    """Per-protein Pfam domain organisations (interpro/xrefs/
    domorgs.py:28-90) -> per-ida_id deduped search documents
    (elastic/export.py:296-316,429-475). The id hash is sha-256 here
    (the reference uses sha-1, which DuckDB lacks; same role)."""
    from ..domain.documents import ida_documents

    li = t(spark, sf, "lineitem")
    pk = F.col("l_partkey") % 30
    # sort key (start, end, pfam, ikey): the testdata's lineitem has
    # duplicate linenumbers per order, so (start, end) alone ties —
    # ikey is the null-free interpro tiebreak (Spark sorts struct
    # NULLs first, DuckDB last; coalesce'ing to '' removes the skew)
    ipr = F.when(pk % 3 == 0, F.concat(F.lit("IPR"), pk % 10))
    locs = li.select(
        F.col("l_orderkey"),
        F.struct(
            (F.col("l_linenumber") * 10).cast("long").alias("start"),
            (F.col("l_linenumber") * 10 + 8 + pk % 7).cast("long").alias("end"),
            F.concat(F.lit("PF"), pk).alias("pfam"),
            F.coalesce(ipr, F.lit("")).alias("ikey"),
            ipr.alias("interpro"),
        ).alias("loc"),
    )
    per_protein = (
        locs.groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_list("loc")).alias("locations"))
        .withColumn(
            "dom_key",
            F.expr(
                "array_join(transform(locations, l -> if(l.interpro is null,"
                " l.pfam, concat(l.pfam, ':', l.interpro))), '-')"
            ),
        )
        .withColumn("dom_id", F.sha2(F.col("dom_key").cast("binary"), 256))
    )
    o = t(spark, sf, "orders").select(
        "o_orderkey",
        F.col("o_orderdate").cast("string").alias("date"),
        (100 + F.col("o_orderkey") % 200).alias("length"),
    )
    domorgs = per_protein.join(o, F.col("l_orderkey") == F.col("o_orderkey")).select(
        F.col("l_orderkey").cast("string").alias("protein_acc"),
        "dom_id",
        "dom_key",
        "date",
        "length",
        "locations",
    )
    names = spark.range(30).select(
        F.concat(F.lit("PF"), F.col("id")).alias("entry_acc"),
        F.when(F.col("id") % 11 != 7, F.concat(F.lit("pf_sn_"), F.col("id"))).alias(
            "short_name"
        ),
    ).unionByName(
        spark.range(10).select(
            F.concat(F.lit("IPR"), F.col("id")).alias("entry_acc"),
            F.concat(F.lit("ipr_sn_"), F.col("id")).alias("short_name"),
        )
    )
    return ida_documents(domorgs, names)


register(QuerySpec(
    name="ida_documents",
    tags=("J9", "A6", "A12", "F3"),
    description="IDA search documents, one per distinct domain "
    "architecture (reference gen_ida_docs, elastic/export.py:296-316,"
    "429-475): per-protein Pfam organisations keyed by content hash, "
    "representative = oldest member protein (accession tiebreak), and "
    "the flattened pfam-then-interpro domain list with short-name "
    "lookups rendered canonically.",
    build=_ida_documents,
    oracle="""
WITH locs AS (
  SELECT l_orderkey AS pk_protein,
         'PF' || (l_partkey % 30) AS pfam,
         CASE WHEN (l_partkey % 30) % 3 = 0 THEN 'IPR' || ((l_partkey % 30) % 10) END AS interpro,
         CAST(l_linenumber * 10 AS BIGINT) AS s,
         CAST(l_linenumber * 10 + 8 + (l_partkey % 30) % 7 AS BIGINT) AS e
  FROM lineitem
),
orgs AS (
  SELECT pk_protein,
         string_agg(CASE WHEN interpro IS NULL THEN pfam
                         ELSE pfam || ':' || interpro END, '-'
                    ORDER BY s, e, pfam, coalesce(interpro, '')) AS dom_key
  FROM locs GROUP BY 1
),
ids AS (SELECT pk_protein, dom_key, sha256(dom_key) AS dom_id FROM orgs),
members AS (
  SELECT i.*, CAST(o_orderdate AS VARCHAR) AS date,
         100 + o_orderkey % 200 AS length,
         CAST(pk_protein AS VARCHAR) AS protein_acc
  FROM ids i JOIN orders ON pk_protein = o_orderkey
),
reps AS (
  SELECT dom_id, dom_key AS ida, protein_acc AS rep_protein,
         length AS rep_length, pk_protein AS rep_pk,
         count(*) OVER (PARTITION BY dom_id) AS n_proteins,
         row_number() OVER (PARTITION BY dom_id ORDER BY date, protein_acc) AS rn
  FROM members
),
rep1 AS (SELECT * FROM reps WHERE rn = 1),
names AS (
  SELECT 'PF' || i AS acc, CASE WHEN i % 11 != 7 THEN 'pf_sn_' || i END AS short_name
  FROM (SELECT unnest(generate_series(0, 29)) AS i)
  UNION ALL
  SELECT 'IPR' || i, 'ipr_sn_' || i FROM (SELECT unnest(generate_series(0, 9)) AS i)
),
locs2 AS (
  -- per-location index: duplicate locations emit their (pfam, ipr)
  -- element PAIRS consecutively, like the flatten on the Spark side
  SELECT *, row_number() OVER (PARTITION BY pk_protein
              ORDER BY s, e, pfam, coalesce(interpro, '')) AS loc_idx
  FROM locs
),
elems AS (
  SELECT r.dom_id, l.s, l.e, l.loc_idx, x.acc, x.ord
  FROM rep1 r
  JOIN locs2 l ON l.pk_protein = r.rep_pk
  CROSS JOIN LATERAL (VALUES (l.pfam, 0), (l.interpro, 1)) AS x(acc, ord)
  WHERE x.acc IS NOT NULL
)
SELECT r.dom_id AS ida_id, r.ida, r.rep_protein, r.rep_length,
       CAST(r.n_proteins AS BIGINT) AS n_proteins,
       (SELECT string_agg(e.acc || '=' || coalesce(n.short_name, '') || ':' || e.s || '-' || e.e,
                          ',' ORDER BY e.loc_idx, e.ord)
        FROM elems e LEFT JOIN names n ON e.acc = n.acc
        WHERE e.dom_id = r.dom_id) AS domains_str
FROM rep1 r
    """,
))


def _synth_site_merged(spark: SparkSession, sf: str):
    """merge_uniparc_matches-shaped rows with nested sites: every even
    order key carries one site with two siteLocations."""
    k = F.col("o_orderkey")
    start = (k % 300 + 1).cast("long")
    end = start + 50
    site = F.struct(
        F.concat(F.lit("site "), k % 5).alias("description"),
        F.lit(2).cast("int").alias("numLocations"),
        F.array(
            F.struct(
                (start + 1).alias("res_start"),
                (start + 1).alias("res_end"),
                F.lit("H").alias("residue"),
            ),
            F.struct(
                (start + 5).alias("res_start"),
                (start + 6).alias("res_end"),
                F.lit("C").alias("residue"),
            ),
        ).alias("siteLocations"),
    )
    sites = F.when(k % 2 == 0, F.array(site)).otherwise(
        F.expr(f"CAST(array() AS {_SITES_T})")
    )
    loc = F.struct(start.alias("start"), end.alias("end"), sites.alias("sites"))
    libs = ["CATH-FunFam", "CATH-Gene3D", "PROSITE patterns", "SFLD"]
    return t(spark, sf, "orders").select(
        F.concat(F.lit("UPI"), F.col("o_custkey")).alias("upi"),
        F.element_at(
            F.array(*[F.lit(x) for x in libs]), (k % 4 + 1).cast("int")
        ).alias("library"),
        F.lit("v1").alias("version"),
        F.concat(F.lit("SIG"), k % 50).alias("signature_acc"),
        F.array(loc).alias("locations"),
    )


def _synth_sequences(spark: SparkSession, sf: str):
    return (
        t(spark, sf, "orders")
        .select(F.concat(F.lit("UPI"), F.col("o_custkey")).alias("upi"))
        .distinct()
        .withColumn("md5", F.md5("upi"))
    )


register(QuerySpec(
    name="z_lookup_sites",
    tags=("S14", "F3", "J1", "X4"),
    description="LOOKUP_SITE rows (reference insert_sites, interpro/"
    "oracle/lookup.py:280-326): the matches -> locations -> sites -> "
    "siteLocations 4-level explode over the typed uniparc merge output, "
    "keyed by sequence md5 + 3-char list-partition prefix with the I5 "
    "analysis-name mapping (FUNFAM/GENE3D renames, space->underscore).",
    build=lambda spark, sf: lookup_site_rows(
        _synth_site_merged(spark, sf), _synth_sequences(spark, sf)
    ),
    oracle="""
WITH base AS (
  SELECT o_orderkey AS k, 'UPI' || o_custkey AS upi,
         CAST(o_orderkey % 300 + 1 AS BIGINT) AS loc_start,
         CAST(o_orderkey % 300 + 51 AS BIGINT) AS loc_end,
         'SIG' || (o_orderkey % 50) AS signature_acc,
         CASE CAST(o_orderkey % 4 AS INT)
           WHEN 0 THEN 'FUNFAM' WHEN 1 THEN 'GENE3D'
           WHEN 2 THEN 'PROSITE_PATTERNS' ELSE 'SFLD' END AS analysis
  FROM orders WHERE o_orderkey % 2 = 0
)
SELECT md5(b.upi) AS md5,
       substring(md5(b.upi), 1, 3) AS md5_prefix,
       b.analysis, 'v1' AS version, b.signature_acc,
       b.loc_start, b.loc_end,
       2 AS num_sites,
       CASE sl.i WHEN 1 THEN 'H' ELSE 'C' END AS residue,
       CASE sl.i WHEN 1 THEN b.loc_start + 1 ELSE b.loc_start + 5 END AS res_start,
       CASE sl.i WHEN 1 THEN b.loc_start + 1 ELSE b.loc_start + 6 END AS res_end,
       'site ' || (b.k % 5) AS description
FROM base b, LATERAL unnest([1, 2]) AS sl(i)
    """,
))


def _hmm_occupancy(spark: SparkSession, sf: str):
    from ..domain.hmm import occupancy_col

    trans = (
        t(spark, sf, "part")
        .select(
            F.col("p_partkey").alias("m"),
            (F.col("p_partkey") % 18 + 2).alias("mlen"),
        )
        .select(
            "m",
            F.expr(
                "transform(sequence(0, CAST(mlen - 1 AS INT)), pos -> struct("
                " CAST(((m*31 + pos*17) % 80 + 10) / 100.0 AS DOUBLE) AS mm,"
                " CAST(((m*13 + pos*7) % 10) / 100.0 AS DOUBLE) AS mi,"
                " CAST(((m*7 + pos*3) % 10) / 100.0 AS DOUBLE) AS dm))"
            ).alias("trans"),
        )
    )
    occ = trans.select("m", occupancy_col("trans").alias("occ"))
    return occ.select(
        F.concat(F.lit("M"), F.col("m")).alias("model_id"),
        F.posexplode("occ").alias("k0", "occ"),
    ).select("model_id", (F.col("k0") + 1).cast("int").alias("k"), "occ")


register(QuerySpec(
    name="z_hmm_occupancy",
    tags=("W4", "F9", "X2"),
    description="HMM match-state occupancy (reference hmmlogo indel "
    "math, interpro/oracle/hmms.py:342-354): the frame-free first-order "
    "recurrence occ[k] = occ[k-1]*(mm+mi) + (1-occ[k-1])*dm computed as "
    "a JVM aggregate fold over the per-model transitions array — "
    "windows cannot express it, the bounded per-model array can; the "
    "oracle replays the recurrence as a recursive CTE with identical "
    "IEEE operation order (bit-exact doubles).",
    build=_hmm_occupancy,
    oracle="""
WITH RECURSIVE models AS (
  SELECT p_partkey AS m, p_partkey % 18 + 2 AS mlen FROM part
),
trans AS (
  SELECT m, s.pos,
         ((m*31 + s.pos*17) % 80 + 10) / 100.0 AS mm,
         ((m*13 + s.pos*7) % 10) / 100.0 AS mi,
         ((m*7 + s.pos*3) % 10) / 100.0 AS dm
  FROM models, LATERAL unnest(generate_series(0, mlen - 1)) AS s(pos)
),
occ AS (
  SELECT m, 1 AS k, mi + mm AS occ FROM trans WHERE pos = 0
  UNION ALL
  SELECT o.m, o.k + 1, o.occ * (tr.mm + tr.mi) + (1.0 - o.occ) * tr.dm
  FROM occ o JOIN trans tr ON tr.m = o.m AND tr.pos = o.k
)
SELECT 'M' || m AS model_id, CAST(k AS INT) AS k, occ FROM occ
    """,
))


def _toad_reassembly(spark: SparkSession, sf: str):
    from ..domain.fragments import reassemble_toad_fragments

    li = t(spark, sf, "lineitem")
    pf = (F.col("l_orderkey") * 7 + F.col("l_suppkey") * 3) % 500 + 1
    toad = li.select(
        F.concat(F.lit("P"), F.col("l_orderkey") % 2000).alias("protein_acc"),
        F.concat(F.lit("S"), F.col("l_partkey") % 50).alias("signature_acc"),
        (F.col("l_linenumber") % 3).cast("int").alias("group_id"),
        pf.cast("long").alias("pos_from"),
        (pf + F.col("l_partkey") % 40 + 1).cast("long").alias("pos_to"),
        # score functionally dependent on the group key (the reference
        # groups fragments of ONE model hit, which share a score)
        (
            (
                (F.col("l_orderkey") % 2000) * 13
                + (F.col("l_partkey") % 50) * 7
                + F.col("l_linenumber") % 3
            )
            % 97
        )
        .cast("long")
        .alias("score"),
    )
    out = reassemble_toad_fragments(toad)
    return out.select(
        "protein_acc",
        "signature_acc",
        "group_id",
        "score",
        F.expr(
            "array_join(transform(fragments, f -> concat(f.start, '-',"
            " f.end, ':', f.dc_status)), ',')"
        ).alias("frags_str"),
    )


register(QuerySpec(
    name="z_toad_reassembly",
    tags=("X3", "F1", "A4", "O3"),
    description="TOAD discontinuous-fragment reassembly (reference "
    "_merge_toad_matches, interpro/oracle/matches.py:692-746): rows "
    "sharing (protein, signature, group) become one location whose "
    "sorted fragments carry N/C/NC terminal-discontinuity statuses "
    "(lone fragment CONTINUOUS); the oracle replays the status "
    "assignment with windowed row indexes.",
    build=_toad_reassembly,
    oracle="""
WITH rows0 AS (
  SELECT 'P' || (l_orderkey % 2000) AS protein_acc,
         'S' || (l_partkey % 50) AS signature_acc,
         CAST(l_linenumber % 3 AS INT) AS group_id,
         CAST((l_orderkey * 7 + l_suppkey * 3) % 500 + 1 AS BIGINT) AS s,
         CAST((l_orderkey * 7 + l_suppkey * 3) % 500 + 1
              + l_partkey % 40 + 1 AS BIGINT) AS e,
         CAST(((l_orderkey % 2000) * 13 + (l_partkey % 50) * 7
               + l_linenumber % 3) % 97 AS BIGINT) AS score
  FROM lineitem
),
g AS (
  SELECT *,
         row_number() OVER (PARTITION BY protein_acc, signature_acc, group_id
                            ORDER BY s, e) AS i,
         count(*) OVER (PARTITION BY protein_acc, signature_acc, group_id) AS n
  FROM rows0
)
SELECT protein_acc, signature_acc, group_id, score,
       string_agg(s || '-' || e || ':' ||
         CASE WHEN n = 1 THEN 'CONTINUOUS'
              WHEN i = 1 THEN 'C_TERMINAL_DISC'
              WHEN i = n THEN 'N_TERMINAL_DISC'
              ELSE 'NC_TERMINAL_DISC' END,
         ',' ORDER BY s, e) AS frags_str
FROM g GROUP BY 1, 2, 3, 4
    """,
))
