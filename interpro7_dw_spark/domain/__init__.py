"""InterPro domain semantics re-expressed Spark-first.

This subpackage carries the reference's hard algorithms (SURVEY.md
§2.11 X1-X3, §2.9 G5, §2.5 W3) with faithful semantics:

- ``fragments``   fragment-string parsing + location condensation as
                  pure column expressions (JVM-side, no UDF);
- ``repr_domains`` representative-domain selection (the exponential
                  independent-set search) as an Arrow-batched
                  applyInPandas operator;
- ``pipeline``    merge_protein_matches — the reference's
                  merge_uniprot_matches task as one DataFrame job.
"""

from .fragments import parse_fragments, condense_locations_col
from .repr_domains import select_repr_domains
from .pipeline import merge_protein_matches
from .xrefs import sim_entries, filter_ec_numbers
from .taxonomy import main_rank_lineage, taxon_distribution_tree
from .clans import clan_alignment_graph
from .hmm import parse_hmm_models
from .documents import relationship_documents
from .marts import entry_xrefs_mart
from .uniparc import merge_uniparc_matches
from .stats import sequence_database_stats

__all__ = [
    "parse_fragments",
    "condense_locations_col",
    "select_repr_domains",
    "merge_protein_matches",
    "sim_entries",
    "filter_ec_numbers",
    "main_rank_lineage",
    "taxon_distribution_tree",
    "clan_alignment_graph",
    "parse_hmm_models",
    "relationship_documents",
    "entry_xrefs_mart",
    "merge_uniparc_matches",
    "sequence_database_stats",
]
