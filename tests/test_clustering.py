"""Clustering tests: AHC edge cases (incl. the reference suite's
over-merge regression, pyannote tests/test_clustering.py:6-29), constrained
assignment, filtering, and VBx on synthetic PLDA data."""

import numpy as np
import pytest

from diarizen_tpu.cluster import (
    AgglomerativeClustering,
    VBxClustering,
    ahc_cluster,
    assign_embeddings,
    constrained_argmax,
    filter_embeddings,
    filter_embeddings_by_frames,
    set_num_clusters,
)
from diarizen_tpu.cluster.vbx import cluster_vbx, vbx


def _three_blobs(rng, n_per=40, dim=32):
    centers = rng.standard_normal((3, dim)) * 4
    emb = np.concatenate(
        [centers[i] + 0.2 * rng.standard_normal((n_per, dim)) for i in range(3)]
    )
    labels = np.repeat(np.arange(3), n_per)
    return emb.astype(np.float64), labels


def test_ahc_finds_three_clusters(rng):
    emb, labels = _three_blobs(rng)
    clusters = ahc_cluster(emb, 1, 20, threshold=0.7, min_cluster_size=5)
    assert len(np.unique(clusters)) == 3
    # clusters must be a relabeling of ground truth
    for k in range(3):
        assert len(np.unique(clusters[labels == k])) == 1


def test_ahc_does_not_overmerge_when_target_met(rng):
    """Regression parity with reference test_clustering.py:6-29 (#1525):
    when threshold already yields num_clusters, do not merge further."""
    emb, _ = _three_blobs(rng)
    clusters = ahc_cluster(emb, 3, 3, num_clusters=3, threshold=0.7, min_cluster_size=5)
    assert len(np.unique(clusters)) == 3


def test_ahc_forced_num_clusters(rng):
    emb, _ = _three_blobs(rng)
    c2 = ahc_cluster(emb, 2, 2, num_clusters=2, threshold=0.7, min_cluster_size=5)
    assert len(np.unique(c2)) == 2


def test_ahc_small_cluster_reassignment(rng):
    emb, labels = _three_blobs(rng, n_per=40)
    # add 2 outliers near blob 0 -> their tiny cluster must be absorbed
    outliers = emb[labels == 0][:2] + 0.6 * rng.standard_normal((2, emb.shape[1]))
    emb2 = np.concatenate([emb, outliers])
    clusters = ahc_cluster(emb2, 1, 20, threshold=0.7, min_cluster_size=5)
    assert len(np.unique(clusters)) == 3


def test_set_num_clusters_bounds():
    assert set_num_clusters(10, None, None, None) == (None, 1, 10)
    assert set_num_clusters(10, 3, None, None) == (3, 3, 3)
    assert set_num_clusters(2, None, 5, 20) == (2, 2, 2)


def test_filter_embeddings_clean_frames():
    seg = np.zeros((2, 10, 3))
    seg[0, :6, 0] = 1  # clean speaker
    seg[0, :6, 1] = 1  # fully overlapped with speaker 0 -> no clean frames
    seg[1, :2, 2] = 1  # short but clean
    mask = filter_embeddings_by_frames(seg, min_frames=2)
    assert mask.tolist() == [[False, False, False], [False, False, True]]
    # speakers 0/1 overlap on every frame -> excluded at min_frames>=1
    mask0 = filter_embeddings_by_frames(seg, min_frames=0)
    assert mask0.all()

    emb = np.random.default_rng(0).standard_normal((2, 3, 8))
    emb[1, 0] = np.nan
    filtered, chunk_idx, speaker_idx = filter_embeddings(emb, seg, min_frames_ratio=0.1)
    # min_frames = round(0.1*10)=1: only chunk1/speaker2 passes -> fallback to 0
    # fallback keeps active+valid: (0,0),(0,1),(1,2)
    assert list(zip(chunk_idx.tolist(), speaker_idx.tolist())) == [(0, 0), (0, 1), (1, 2)]


def test_constrained_argmax_unique_clusters():
    soft = np.array([[[0.9, 0.8], [0.85, 0.1], [0.2, 0.1]]])  # 1 chunk, 3 spk, 2 cl
    hard = constrained_argmax(soft.copy())
    # Hungarian: speaker1->cluster0 (0.85), speaker0->cluster1 (0.8); spk2 unassigned
    assert hard[0, 0] == 1 and hard[0, 1] == 0 and hard[0, 2] == -2


def test_assign_embeddings_roundtrip(rng):
    emb, labels = _three_blobs(rng, n_per=10)
    embeddings = emb.reshape(10, 3, -1)  # pretend (chunks=10, spk=3)
    chunk_idx = np.repeat(np.arange(10), 3)
    speaker_idx = np.tile(np.arange(3), 10)
    # embeddings[c, s] = emb[c * 3 + s] -> align labels the same way
    train_clusters = np.array(
        [labels[c * 3 + s] for c, s in zip(chunk_idx, speaker_idx)]
    )
    hard, soft, centroids = assign_embeddings(
        embeddings, chunk_idx, speaker_idx, train_clusters
    )
    assert centroids.shape == (3, emb.shape[1])
    # every embedding must be re-assigned to its own blob's centroid
    expect = train_clusters.reshape(10, 3)
    np.testing.assert_array_equal(hard, expect)


def test_ahc_pipeline_end_to_end(rng):
    emb, labels = _three_blobs(rng, n_per=30)
    embeddings = emb.reshape(30, 3, -1)
    seg = np.zeros((30, 20, 3))
    seg[:, :10, 0] = 1
    seg[:, 10:16, 1] = 1
    seg[:, 16:, 2] = 1
    clustering = AgglomerativeClustering(threshold=0.7, min_cluster_size=5)
    hard, soft, centroids = clustering(embeddings, seg)
    assert hard.shape == (30, 3)
    assert soft.shape[2] == centroids.shape[0]


def test_vbx_gmm_mode_recovers_clusters(rng):
    # synthetic PLDA space: across-class std sqrt(phi), within-class identity
    dim = 16
    phi = np.full(dim, 9.0)
    speakers = rng.standard_normal((3, dim)) * np.sqrt(phi)
    x = np.concatenate([speakers[i] + rng.standard_normal((50, dim)) for i in range(3)])
    labels = np.repeat(np.arange(3), 50)

    # over-clustered AHC init with 6 clusters
    init = np.repeat(np.arange(6), 25)
    gamma, pi = cluster_vbx(init, x, phi, fa=0.3, fb=1.0, max_iters=30)
    assigned = np.argmax(gamma, axis=1)
    surviving = np.unique(assigned)
    assert len(surviving) == 3, f"expected 3 speakers, got {len(surviving)}"
    for k in range(3):
        assert len(np.unique(assigned[labels == k])) == 1


def test_vbx_hmm_mode_runs(rng):
    dim = 8
    phi = np.full(dim, 4.0)
    speakers = rng.standard_normal((2, dim)) * 2
    x = np.concatenate([speakers[i] + rng.standard_normal((30, dim)) for i in range(2)])
    gamma, pi, elbos = vbx(x, phi, loop_prob=0.9, fa=0.3, fb=1.0, pi=4, max_iters=10,
                           rng=np.random.default_rng(0))
    assert gamma.shape == (60, 4)
    np.testing.assert_allclose(gamma.sum(1), 1.0, atol=1e-6)
    assert np.all(np.diff([e for e in elbos[1:]]) > -1.0)  # roughly monotone


def test_vbx_clustering_with_synthetic_plda(rng, tmp_path):
    """Full VBxClustering path with a synthetic identity-ish PLDA dir."""
    dim = 32
    lda_dim = 16
    # xvec transform: identity-ish LDA
    lda = np.eye(dim)[:, :dim]
    np.savez(
        tmp_path / "xvec_transform.npz",
        mean1=np.zeros(dim), mean2=np.zeros(dim), lda=lda,
    )
    tr = np.eye(dim)
    psi = np.concatenate([np.full(lda_dim, 9.0), np.full(dim - lda_dim, 0.1)])
    np.savez(tmp_path / "plda.npz", mu=np.zeros(dim), tr=tr, psi=psi)

    emb, labels = _three_blobs(rng, n_per=40, dim=dim)
    embeddings = emb.reshape(40, 3, dim)
    seg = np.zeros((40, 20, 3))
    seg[:, :6, 0] = 1
    seg[:, 7:13, 1] = 1
    seg[:, 14:, 2] = 1
    clustering = VBxClustering(
        plda_dir=str(tmp_path), ahc_threshold=0.6, fa=0.3, fb=1.0, lda_dim=lda_dim
    )
    hard, soft, centroids = clustering(embeddings, seg)
    assert hard.shape == (40, 3)
    assert soft.shape[:2] == (40, 3)
    assert centroids.shape[1] == dim
