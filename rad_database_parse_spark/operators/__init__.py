from .core import (
    anti_join_dedup,
    classify_title,
    continuation_union,
    exists_probe,
    normalize_strings,
    project_with_lineage,
    row_density,
    semi_join,
    table_density_filter,
    top1_per_group,
    topk_per_group,
)
from .header_map import distributed_header_map, resolve_header_mapping
from .measures import parse_measure
from .abbrev import expand_abbreviations, extract_abbreviation_pairs
from .mutate import delete_where, update_where
from .asof import asof_join

__all__ = [
    "normalize_strings",
    "classify_title",
    "row_density",
    "table_density_filter",
    "continuation_union",
    "project_with_lineage",
    "anti_join_dedup",
    "semi_join",
    "exists_probe",
    "top1_per_group",
    "topk_per_group",
    "resolve_header_mapping",
    "distributed_header_map",
    "parse_measure",
    "extract_abbreviation_pairs",
    "expand_abbreviations",
    "update_where",
    "delete_where",
    "asof_join",
]
