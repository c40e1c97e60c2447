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


# ---------------------------------------------------------------------------
# VBx HMM mode: property tests against brute-force path enumeration
# (the reference cites but does not ship forward_backward —
# diarizen/clustering/VBx.py:91-125 would crash in HMM mode — so no reference
# oracle exists; exact enumeration on tiny chains is the independent oracle).
# ---------------------------------------------------------------------------

from itertools import product as _product

from diarizen_tpu.cluster.vbx import forward_backward


def _enumerate_paths(log_p, tr, pi):
    """Exact posterior by summing over all S**T state paths."""
    t_len, s = log_p.shape
    paths = list(_product(range(s), repeat=t_len))
    logw = np.empty(len(paths))
    for i, path in enumerate(paths):
        lp = np.log(pi[path[0]]) + log_p[0, path[0]]
        for t in range(1, t_len):
            lp += np.log(tr[path[t - 1], path[t]]) + log_p[t, path[t]]
        logw[i] = lp
    from scipy.special import logsumexp as _lse

    log_px = _lse(logw)
    gamma = np.zeros((t_len, s))
    w = np.exp(logw - log_px)
    for i, path in enumerate(paths):
        for t, st in enumerate(path):
            gamma[t, st] += w[i]
    return gamma, log_px, paths, w


@pytest.mark.parametrize("t_len,s,seed", [(4, 2, 0), (5, 3, 1), (6, 3, 2)])
def test_forward_backward_matches_brute_force(t_len, s, seed):
    rng = np.random.default_rng(seed)
    log_p = rng.standard_normal((t_len, s)) * 2.0
    pi = rng.dirichlet(np.ones(s))
    tr = rng.dirichlet(np.ones(s), size=s)  # arbitrary row-stochastic matrix
    gamma, log_px, log_a, log_b = forward_backward(log_p, tr, pi)
    gamma_bf, log_px_bf, _, _ = _enumerate_paths(log_p, tr, pi)
    np.testing.assert_allclose(log_px, log_px_bf, rtol=1e-10)
    np.testing.assert_allclose(gamma, gamma_bf, atol=1e-10)
    # alpha/beta consistency: P(X) recoverable at every time slice
    from scipy.special import logsumexp as _lse

    for t in range(t_len):
        np.testing.assert_allclose(_lse(log_a[t] + log_b[t]), log_px, rtol=1e-10)


@pytest.mark.parametrize("t_len,s,loop,seed", [(5, 2, 0.7, 3), (6, 3, 0.9, 4)])
def test_hmm_pi_update_matches_brute_force_branch_counts(t_len, s, loop, seed):
    """The HMM pi update (vbx.py:96-104) adds the expected number of times the
    chain enters each speaker via the (1-loop)*pi mixture branch. Verify that
    term against exact enumeration: per path, entering state s_t from s_{t-1}
    uses the branch with probability (1-loop)*pi[s_t] / tr[s_{t-1}, s_t]."""
    rng = np.random.default_rng(seed)
    log_p = rng.standard_normal((t_len, s))
    pi = rng.dirichlet(np.ones(s) * 3)
    tr = np.eye(s) * loop + (1 - loop) * pi  # the VBx transition model
    gamma, log_px, log_a, log_b = forward_backward(log_p, tr, pi)

    from scipy.special import logsumexp as _lse

    formula = (1 - loop) * pi * np.sum(
        np.exp(_lse(log_a[:-1], axis=1, keepdims=True) + log_p[1:] + log_b[1:] - log_px),
        axis=0,
    )

    _, _, paths, w = _enumerate_paths(log_p, tr, pi)
    brute = np.zeros(s)
    for path, wi in zip(paths, w):
        for t in range(1, t_len):
            st = path[t]
            brute[st] += wi * (1 - loop) * pi[st] / tr[path[t - 1], st]
    np.testing.assert_allclose(formula, brute, atol=1e-10)


def test_hmm_zero_loop_equals_gmm_posterior():
    """At loop_prob=0 the transition rows all equal pi, frames decouple, and
    the HMM posterior must equal the GMM per-frame posterior exactly."""
    rng = np.random.default_rng(5)
    t_len, s = 7, 3
    log_p = rng.standard_normal((t_len, s))
    pi = rng.dirichlet(np.ones(s))
    tr = np.tile(pi, (s, 1))
    gamma, log_px, _, _ = forward_backward(log_p, tr, pi)
    from scipy.special import logsumexp as _lse

    lpost = log_p + np.log(pi) - _lse(log_p + np.log(pi), axis=1, keepdims=True)
    np.testing.assert_allclose(gamma, np.exp(lpost), atol=1e-12)
    np.testing.assert_allclose(log_px, np.sum(_lse(log_p + np.log(pi), axis=1)), rtol=1e-12)


def test_vbx_hmm_elbo_monotone_and_pi_invariants(rng):
    dim = 8
    phi = np.full(dim, 4.0)
    speakers = rng.standard_normal((2, dim)) * 2
    x = np.concatenate([speakers[i] + rng.standard_normal((40, dim)) for i in range(2)])
    gamma, pi, elbos = vbx(
        x, phi, loop_prob=0.9, fa=0.3, fb=1.0, pi=4, max_iters=15,
        epsilon=-1.0,  # disable early stop so every iteration is checked
        rng=np.random.default_rng(1),
    )
    # VB coordinate ascent: ELBO non-decreasing at every iteration
    diffs = np.diff(elbos)
    assert np.all(diffs > -1e-6 * np.abs(np.asarray(elbos[:-1]))), diffs
    # pi: a valid distribution, redundant speakers shrunk
    assert np.all(pi >= 0) and abs(pi.sum() - 1.0) < 1e-12
    assert np.sort(pi)[-2:].sum() > 0.9  # 2 true speakers dominate
    np.testing.assert_allclose(gamma.sum(1), 1.0, atol=1e-8)


def test_vbx_clustering_hmm_mode_pipeline(rng, tmp_path):
    """VBxClustering with loop_prob > 0 exercises forward_backward through the
    full pipeline-level path (filter -> AHC init -> PLDA -> VB-HMM ->
    centroids -> constrained assignment)."""
    dim = 32
    lda_dim = 16
    lda = np.eye(dim)[:, :dim]
    np.savez(tmp_path / "xvec_transform.npz",
             mean1=np.zeros(dim), mean2=np.zeros(dim), lda=lda)
    psi = np.concatenate([np.full(lda_dim, 9.0), np.full(dim - lda_dim, 0.1)])
    np.savez(tmp_path / "plda.npz", mu=np.zeros(dim), tr=np.eye(dim), psi=psi)

    emb, labels = _three_blobs(rng, n_per=40, dim=dim)
    # one local speaker per blob per chunk (constrained assignment forbids two
    # locals in one chunk sharing a cluster, so same-blob chunks would be
    # forced apart)
    embeddings = np.stack([emb[labels == k] for k in range(3)], axis=1)
    labels = np.tile(np.arange(3), 40)
    seg = np.zeros((40, 20, 3))
    seg[:, :6, 0] = 1
    seg[:, 7:13, 1] = 1
    seg[:, 14:, 2] = 1
    clustering = VBxClustering(
        plda_dir=str(tmp_path), ahc_threshold=0.6, fa=0.3, fb=1.0,
        lda_dim=lda_dim, loop_prob=0.9,
    )
    hard, soft, centroids = clustering(embeddings, seg)
    assert hard.shape == (40, 3)
    # blob structure recovered: each true blob maps to one dominant cluster
    hard_flat = hard.reshape(-1)
    for k in range(3):
        vals, counts = np.unique(hard_flat[labels == k], return_counts=True)
        assert counts.max() / counts.sum() > 0.9
