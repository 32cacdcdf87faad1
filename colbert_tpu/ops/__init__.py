from colbert_tpu.ops.maxsim import maxsim, maxsim_xla, maxsim_pallas, maxsim_qd
from colbert_tpu.ops.kmeans import kmeans, assign_clusters, kmeans_plusplus_init
from colbert_tpu.ops.pq import pq_train, pq_encode, pq_decode, adc_lut, adc_score, adc_score_onehot
from colbert_tpu.ops.sq import sq_train, sq_encode, sq_query, sq_score
from colbert_tpu.ops.ivf import (
    ivf_probe_adc,
    ivf_probe_sq,
    ivf_probe_sq_batched,
    sort_by_list,
    dedup_pids_by_score,
    dedup_pids_by_approx_maxsim,
)
from colbert_tpu.ops.flat_scan import (
    build_flat_table,
    flat_maxsim_scan,
    flat_maxsim_scan_xla,
    flat_topk,
)
from colbert_tpu.ops.topk import topk, topk_merge_gathered
from colbert_tpu.ops.pooling import batch_index_select, span_mean, max_pool_by_mask, avg_pool_by_mask

__all__ = [
    "maxsim", "maxsim_xla", "maxsim_pallas", "maxsim_qd",
    "kmeans", "assign_clusters", "kmeans_plusplus_init",
    "pq_train", "pq_encode", "pq_decode", "adc_lut", "adc_score", "adc_score_onehot",
    "sq_train", "sq_encode", "sq_query", "sq_score",
    "ivf_probe_adc", "ivf_probe_sq", "ivf_probe_sq_batched", "sort_by_list",
    "dedup_pids_by_score", "dedup_pids_by_approx_maxsim",
    "build_flat_table", "flat_maxsim_scan", "flat_maxsim_scan_xla", "flat_topk",
    "topk", "topk_merge_gathered",
    "batch_index_select", "span_mean", "max_pool_by_mask", "avg_pool_by_mask",
]
