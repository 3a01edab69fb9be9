from .distance import (
    pairwise_l2,
    pairwise_ip,
    exact_search,
    merge_topk,
)
