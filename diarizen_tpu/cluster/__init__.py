from diarizen_tpu.cluster.ahc import AgglomerativeClustering, ahc_cluster
from diarizen_tpu.cluster.base import (
    assign_embeddings,
    constrained_argmax,
    cosine_cdist,
    filter_embeddings,
    filter_embeddings_by_frames,
    set_num_clusters,
)
from diarizen_tpu.cluster.oracle import OracleClustering
from diarizen_tpu.cluster.vbx import VBxClustering, cluster_vbx, vbx, vbx_setup

__all__ = [
    "AgglomerativeClustering", "ahc_cluster", "assign_embeddings",
    "constrained_argmax", "cosine_cdist", "filter_embeddings",
    "filter_embeddings_by_frames", "set_num_clusters",
    "VBxClustering", "cluster_vbx", "vbx", "vbx_setup", "OracleClustering",
]
