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

Why applyInPandas: the subset search is inherently procedural and
exponential (capped); everything around it stays in DataFrame land.
One protein's domains are a few dozen rows — a group fits trivially
in memory, and Arrow batches thousands of groups per Python call.

The grouped-map kernel is a closure, not a module-level function, so
cloudpickle ships it BY VALUE — Python workers need neither this
package on their path nor a matching working directory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

MAX_DOM_BY_GROUP = 20
DOM_OVERLAP_THRESHOLD = 0.3

# input/output schema for the grouped-map step; fragments are
# (start, end) pairs — dc_status does not influence selection
REPR_SCHEMA = (
    "protein_acc string, domain_id long, rank int, "
    "fragments array<struct<start bigint, end bigint>>, representative boolean"
)


def select_repr_domains(domains: DataFrame) -> DataFrame:
    """Flag representative domains per protein.

    Input columns: protein_acc, domain_id (unique per protein), rank
    (database priority, 0 = Pfam), fragments array<struct<start,end>>.
    Output: same + ``representative`` boolean.
    """
    max_per_group = MAX_DOM_BY_GROUP
    threshold = DOM_OVERLAP_THRESHOLD

    def select_for_protein(pdf):
        def residues(frags):
            out = set()
            for f in frags:
                out.update(range(int(f["start"]), int(f["end"]) + 1))
            return frozenset(out)

        def best_subset(candidates):
            n = len(candidates)
            conflicts = [set() for _ in range(n)]
            for i in range(n):
                for j in range(i + 1, n):
                    a, b = candidates[i]["residues"], candidates[j]["residues"]
                    inter = len(a & b)
                    if inter and inter / min(len(a), len(b)) >= threshold:
                        conflicts[i].add(j)
                        conflicts[j].add(i)

            best = {"cov": -1, "pfams": -1, "ids": []}

            def dfs(idx, chosen, blocked):
                if idx == n:
                    cov_set = set()
                    pfams = 0
                    for i in chosen:
                        cov_set |= candidates[i]["residues"]
                        if candidates[i]["rank"] == 0:
                            pfams += 1
                    cov = len(cov_set)
                    if cov > best["cov"] or (cov == best["cov"] and pfams > best["pfams"]):
                        best.update(cov=cov, pfams=pfams, ids=list(chosen))
                    return
                if idx not in blocked:  # include-first, like the reference
                    dfs(idx + 1, chosen + [idx], blocked | conflicts[idx])
                dfs(idx + 1, chosen, blocked)

            dfs(0, [], set())
            return best["ids"]

        doms = []
        for row in pdf.itertuples(index=False):
            frags = sorted(row.fragments, key=lambda f: (f["start"], f["end"]))
            doms.append({
                "domain_id": row.domain_id,
                "rank": int(row.rank),
                "fragments": frags,
                "first_start": int(frags[0]["start"]),
                "last_end": int(frags[-1]["end"]),
                "residues": residues(frags),
            })
        doms.sort(key=lambda d: (d["first_start"], d["last_end"]))

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

        rep_ids = set()
        for g in groups:
            candidates = sorted(g, key=lambda d: (-len(d["residues"]), d["rank"]))
            candidates = candidates[:max_per_group]
            for i in best_subset(candidates):
                rep_ids.add(candidates[i]["domain_id"])

        out = pdf.copy()
        out["representative"] = out["domain_id"].isin(rep_ids)
        return out

    cols = ["protein_acc", "domain_id", "rank", "fragments"]
    return (
        domains.select(*cols)
        .groupBy("protein_acc")
        .applyInPandas(select_for_protein, REPR_SCHEMA)
    )
