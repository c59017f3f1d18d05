from .relational import (
    anti_join_unprocessed,
    assign_submission_offset,
    cap_duplicate_submissions,
    latest_per_group,
    map_collect_json,
    point_lookup,
    topk_per_group,
)

__all__ = [
    "anti_join_unprocessed",
    "assign_submission_offset",
    "cap_duplicate_submissions",
    "latest_per_group",
    "map_collect_json",
    "point_lookup",
    "topk_per_group",
]
