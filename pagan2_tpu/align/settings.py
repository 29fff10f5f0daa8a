"""Alignment engine settings (typed replacement of the Settings singleton).

Defaults mirror Basic_alignment::set_basic_settings /
set_reads_alignment_settings / set_additional_settings
(basic_alignment.h:546-629)."""
from __future__ import annotations

from dataclasses import dataclass, replace


@dataclass(frozen=True)
class AlignSettings:
    max_allowed_skip_distance: float = 0.5
    max_allowed_skip_branches: int = 10
    max_allowed_match_skip_branches: int = 5
    branch_skip_weight: float = 1.0
    branch_skip_probability: float = 0.9
    weighted_branch_skip_penalty: bool = False
    weight_edges: bool = False
    compute_full_score: bool = False
    # default on: set_additional_settings flips it on unless
    # --no-reduced-terminal-penalties (basic_alignment.h:627-628)
    reduced_terminal_gap_penalties: bool = True
    no_terminal_edges: bool = False
    edges_for_skipped_flanked_by_gaps: bool = False
    pair_end_reads: bool = False
    sample_path: bool = False
    sample_additional_paths: int = 0
    # anchoring (--no-anchors / --use-prefix-anchors; node.cpp:87-152).
    # The reference anchors every pair; we gate by size since tiny
    # matrices are cheaper than anchor discovery.
    use_anchors: bool = True
    use_prefix_anchors: bool = False
    anchor_min_sites: int = 3000
    prefix_hit_length: int = 30
    anchors_offset: int = 15

    def for_reads(self) -> "AlignSettings":
        """set_reads_alignment_settings (basic_alignment.h:572-586)."""
        return replace(self,
                       max_allowed_skip_distance=5.0,
                       max_allowed_skip_branches=50000,
                       max_allowed_match_skip_branches=50000,
                       branch_skip_weight=1.0,
                       branch_skip_probability=1.0)


# DP matrix ids (basic_alignment.h enum)
X_MAT = 0
Y_MAT = 1
M_MAT = 2

# gap types (viterbi_alignment)
NORMAL_GAP = 0
END_GAP = 1
PAIR_BREAK_GAP = 2
