from .grouping import (ScoredEntry, partition_collection,
                       select_top_ranked_elements, select_best_matches,
                       group_matches_by_mask)
from .normalization import normalize_match_scores
