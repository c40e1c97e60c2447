"""bf16 embedding transport parity study (VERDICT r4 item 5 / PERF.md).

Question: the merged per-file d2h fetch is ~46 ms on the tunnel, about half
of it f32 embedding bytes (infer/fused.py). Shipping embeddings bf16 would
halve that — does rounding (chunk, speaker, 256) embeddings to bf16 change
AHC / VBx cluster assignments?

Method: synthetic embedding ensembles across (num_speakers, separation,
seed): von-Mises-Fisher-ish clusters on the unit sphere with within-class
noise, shaped like real WeSpeaker output (unnormalized scale ~10). For each
ensemble run AgglomerativeClustering (threshold 0.7, centroid, constrained
assignment — the recipe settings) and VBxClustering on f32 vs bf16-rounded
embeddings; report the fraction of differing hard assignments and the rate
of identical partitions.

Run: python < tools/study_bf16_embeddings.py   (CPU, ~1 min)
"""

import itertools

import numpy as np

import jax.numpy as jnp


def bf16_roundtrip(x: np.ndarray) -> np.ndarray:
    return np.asarray(jnp.asarray(x, jnp.bfloat16), np.float32).astype(np.float64)


def make_ensemble(rng, n_spk, sep, num_chunks=60, dim=256, scale=10.0):
    """(chunks, S, dim) embeddings + binary segmentations like a real file:
    each chunk has 1-3 active local speakers drawn from n_spk globals."""
    centers = rng.standard_normal((n_spk, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    S = 4
    emb = np.full((num_chunks, S, dim), np.nan)
    seg = np.zeros((num_chunks, 40, S))
    for c in range(num_chunks):
        active = rng.choice(n_spk, size=rng.integers(1, min(3, n_spk) + 1),
                            replace=False)
        for s, g in enumerate(active):
            v = centers[g] + rng.standard_normal(dim) / (sep * np.sqrt(dim))
            emb[c, s] = scale * v / np.linalg.norm(v)
            seg[c, rng.integers(0, 20) : rng.integers(25, 40), s] = 1
    return emb, seg


def run_case(cluster_factory, emb, seg):
    hard, _, _ = cluster_factory()(emb.copy(), seg, min_clusters=1, max_clusters=8)
    return hard


def main():
    from diarizen_tpu.cluster import AgglomerativeClustering, VBxClustering
    import tempfile, os

    # synthetic identity-ish PLDA dir for VBx
    tmp = tempfile.mkdtemp()
    dim, lda_dim = 256, 64
    np.savez(os.path.join(tmp, "xvec_transform.npz"),
             mean1=np.zeros(dim), mean2=np.zeros(dim), lda=np.eye(dim))
    psi = np.concatenate([np.full(lda_dim, 9.0), np.full(dim - lda_dim, 0.1)])
    np.savez(os.path.join(tmp, "plda.npz"), mu=np.zeros(dim), tr=np.eye(dim),
             psi=psi)

    methods = {
        "AHC": lambda: AgglomerativeClustering(
            threshold=0.7, method="centroid", min_cluster_size=2,
            constrained_assignment=True),
        "VBx": lambda: VBxClustering(
            plda_dir=tmp, ahc_criterion="distance", ahc_threshold=0.6,
            fa=0.07, fb=0.8, lda_dim=lda_dim),
    }

    grid = list(itertools.product([2, 4, 8], [0.7, 1.0, 2.0, 4.0], range(10)))
    for name, factory in methods.items():
        diffs, identical, total = 0, 0, 0
        worst = 0.0
        for n_spk, sep, seed in grid:
            rng = np.random.default_rng(1000 * n_spk + int(10 * sep) + seed)
            emb, seg = make_ensemble(rng, n_spk, sep)
            h32 = run_case(factory, emb, seg)
            h16 = run_case(factory, bf16_roundtrip(emb), seg)
            n = h32.size
            d = int(np.sum(h32 != h16))
            diffs += d
            total += n
            identical += int(d == 0)
            worst = max(worst, d / n)
        print(f"{name}: assignment diff rate {diffs/total:.5%} "
              f"({diffs}/{total}); identical partitions "
              f"{identical}/{len(grid)}; worst case {worst:.3%}", flush=True)


if __name__ == "__main__":
    main()
