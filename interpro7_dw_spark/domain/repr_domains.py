"""Representative-domain selection (reference
interpro/oracle/matches.py:106-232) as an Arrow-batched grouped-map
operator.

Semantics (re-derived, not transcribed):
1. sort a protein's domains by (first fragment start, last fragment
   end); chain-group domains whose spans touch the running group span;
2. within a group keep the best MAX_DOM_BY_GROUP=20 candidates by
   (-covered_residues, rank);
3. build the conflict relation: two domains conflict when their
   residue-set overlap >= 30% of the smaller set;
4. search all conflict-free subsets (include-first DFS in candidate
   order — same visit order as the reference's recursive enumeration,
   so equal-score ties resolve identically) and keep the subset with
   max residue coverage, ties broken by more rank-0 (Pfam) members;
5. flag those domains representative.

Why a scalar Arrow pandas_udf over collected arrays (not
applyInPandas): one protein's domains are a handful of rows, and a
grouped-map pays per-GROUP pandas-DataFrame construction — ~100s of
microseconds x millions of proteins dominates runtime. Collecting each
protein's domains into one array row first (a groupBy Spark needs
anyway) turns the Python step into a plain loop over an Arrow batch:
thousands of proteins per call, no per-group overhead.

The kernel is a closure, not a module-level function, so cloudpickle
ships it BY VALUE — Python workers need neither this package on their
path nor a matching working directory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAX_DOM_BY_GROUP = 20
DOM_OVERLAP_THRESHOLD = 0.3


def _make_repr_udf():
    max_per_group = MAX_DOM_BY_GROUP
    threshold = DOM_OVERLAP_THRESHOLD

    # residue-set algebra as interval lists (identical semantics to the
    # reference's Python sets of positions, but O(#fragments) not O(span))
    def residues(frags):
        """Merged inclusive intervals covering the fragments."""
        out = []
        for f in frags:  # frags sorted by (start, end)
            s, e = int(f["start"]), int(f["end"])
            if out and s <= out[-1][1] + 1:
                if e > out[-1][1]:
                    out[-1] = (out[-1][0], e)
            else:
                out.append((s, e))
        return out

    def ilen(ivs):
        return sum(e - s + 1 for s, e in ivs)

    def ioverlap(a, b):
        total = i = j = 0
        while i < len(a) and j < len(b):
            s = max(a[i][0], b[j][0])
            e = min(a[i][1], b[j][1])
            if s <= e:
                total += e - s + 1
            if a[i][1] < b[j][1]:
                i += 1
            else:
                j += 1
        return total

    def iunion(ivsets):
        flat = sorted(iv for ivs in ivsets for iv in ivs)
        merged = []
        for s, e in flat:
            if merged and s <= merged[-1][1] + 1:
                if e > merged[-1][1]:
                    merged[-1] = (merged[-1][0], e)
            else:
                merged.append((s, e))
        return merged

    def best_subset(candidates):
        n = len(candidates)
        conflicts = [set() for _ in range(n)]
        for i in range(n):
            for j in range(i + 1, n):
                a, b = candidates[i]["residues"], candidates[j]["residues"]
                inter = ioverlap(a, b)
                if inter and inter / min(candidates[i]["size"], candidates[j]["size"]) >= threshold:
                    conflicts[i].add(j)
                    conflicts[j].add(i)

        best = {"cov": -1, "pfams": -1, "ids": []}

        def dfs(idx, chosen, blocked):
            if idx == n:
                cov = ilen(iunion([candidates[i]["residues"] for i in chosen]))
                pfams = sum(1 for i in chosen if candidates[i]["rank"] == 0)
                if cov > best["cov"] or (cov == best["cov"] and pfams > best["pfams"]):
                    best.update(cov=cov, pfams=pfams, ids=list(chosen))
                return
            if idx not in blocked:  # include-first, like the reference
                dfs(idx + 1, chosen + [idx], blocked | conflicts[idx])
            dfs(idx + 1, chosen, blocked)

        dfs(0, [], set())
        return best["ids"]

    def select_one(dom_rows) -> list[int]:
        doms = []
        for row in dom_rows:
            frags = sorted(row["fragments"], key=lambda f: (f["start"], f["end"]))
            ivs = residues(frags)
            doms.append({
                "domain_id": row["domain_id"],
                "rank": int(row["rank"]),
                "first_start": int(frags[0]["start"]),
                "last_end": int(frags[-1]["end"]),
                "residues": ivs,
                "size": ilen(ivs),
            })
        # domain_id tiebreak: collect_list order is nondeterministic,
        # so exact (start, end) ties must not fall back to input order
        # or the representative flag could flip between runs
        doms.sort(key=lambda d: (d["first_start"], d["last_end"], d["domain_id"]))

        # chain-group overlapping domains
        groups = []
        group = [doms[0]]
        stop = doms[0]["last_end"]
        for d in doms[1:]:
            if d["first_start"] <= stop:
                group.append(d)
                stop = max(stop, d["last_end"])
            else:
                groups.append(group)
                group = [d]
                stop = d["last_end"]
        groups.append(group)

        rep_ids = []
        for g in groups:
            # fast path: a lone domain is always representative
            if len(g) == 1:
                rep_ids.append(g[0]["domain_id"])
                continue
            candidates = sorted(g, key=lambda d: (-d["size"], d["rank"], d["domain_id"]))
            candidates = candidates[:max_per_group]
            rep_ids.extend(candidates[i]["domain_id"] for i in best_subset(candidates))
        return rep_ids

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def repr_ids(doms_series):
        import pandas as pd

        return pd.Series([select_one(rows) for rows in doms_series])

    return repr_ids


def repr_id_sets(
    domains: DataFrame, group_cols: tuple[str, ...] = ("protein_acc",)
) -> DataFrame:
    """The kernel's raw output: ONE row per group carrying the
    representative domain_ids as an array — the group-sized relation a
    caller can attach back to its match-sized input with a
    ``group_cols``-keyed join + ``array_contains`` (what the merge
    pipeline does), instead of exploding to per-domain rows first.
    Output: (*group_cols, doms, rep_ids array<long>) — ``doms`` is the
    group's full collected domain-struct array (match-sized in total)
    kept for :func:`select_repr_domains`'s re-explode; callers joining
    rep_ids back to their own match relation should drop it."""
    repr_udf = _make_repr_udf()
    return (
        domains.groupBy(*group_cols)
        .agg(F.collect_list(F.struct("domain_id", "rank", "fragments")).alias("doms"))
        .select(*group_cols, "doms", repr_udf(F.col("doms")).alias("rep_ids"))
    )


def select_repr_domains(
    domains: DataFrame, group_cols: tuple[str, ...] = ("protein_acc",)
) -> DataFrame:
    """Flag representative domains per group (default: per protein;
    the merge pipeline groups by (protein, class) so one grouped pass
    covers the reference's two separate selection runs).

    Input columns: ``group_cols``, domain_id (unique within a
    protein), rank (database priority, 0 = Pfam), fragments
    array<struct<start,end>>.
    Output: (*group_cols, domain_id, rank, fragments, representative).
    """
    grouped = repr_id_sets(domains, group_cols)
    return grouped.select(
        *group_cols,
        F.explode("doms").alias("d"),
        "rep_ids",
    ).select(
        *group_cols,
        F.col("d.domain_id").alias("domain_id"),
        F.col("d.rank").alias("rank"),
        F.col("d.fragments").alias("fragments"),
        F.array_contains("rep_ids", F.col("d.domain_id")).alias("representative"),
    )
