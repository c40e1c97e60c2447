"""Checkpoint save / load / GC / averaging + structured metric summaries.

Capability parity with the reference (diarizen/trainer_*:239-270 save/GC,
diarizen/ckpt_utils.py:16-100 averaging & best-N selection). Differences by
design:
  * checkpoints are flat .npz pytrees (portable, mmap-able) instead of torch
    pickles;
  * validation metrics are persisted as structured JSONL
    (`metrics.jsonl`: {"epoch", "loss", "der", ...}) instead of the
    reference's load-bearing log-line format parsed back with regexes
    (ckpt_utils.load_metric_summary:45-60 — SURVEY.md section 5 flags this).
"""

from __future__ import annotations

import json
import re
import shutil
import warnings
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

import jax
import numpy as np

SEP = "::"


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{SEP}d{SEP}{k}" if prefix else f"d{SEP}{k}"))
    elif isinstance(tree, (list, tuple)):
        tag = "t" if isinstance(tree, tuple) else "l"
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{SEP}{tag}{SEP}{i}" if prefix else f"{tag}{SEP}{i}"))
    else:
        out[prefix or "leaf"] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Any:
    if list(flat.keys()) == ["leaf"]:
        return flat["leaf"]

    def insert(node, tokens, value):
        kind, key = tokens[0], tokens[1]
        key = int(key) if kind in ("l", "t") else key
        if len(tokens) == 2:
            node[1][key] = value
        else:
            child = node[1].get(key)
            if child is None:
                child = (tokens[2], {})
                node[1][key] = child
            insert(child, tokens[2:], value)

    root = None
    store: Dict = {}
    for name, value in flat.items():
        tokens = name.split(SEP)
        if root is None:
            root = (tokens[0], store)
        insert(root, tokens, value)

    def build(node):
        kind, children = node
        items = {
            k: build(v) if isinstance(v, tuple) else v for k, v in children.items()
        }
        if kind == "d":
            return items
        seq = [items[i] for i in range(len(items))]
        return tuple(seq) if kind == "t" else seq

    return build(root)


def save_pytree(path: str | Path, tree: Any) -> None:
    tree = jax.tree_util.tree_map(np.asarray, tree)
    np.savez(path, **_flatten(tree))


def save_leaves(path: str | Path, tree: Any) -> None:
    """Save only the ordered leaves — for pytrees whose Python structure
    cannot round-trip through npz (optax states: NamedTuples, EmptyState).
    Restore with `load_leaves` + `jax.tree_util.tree_unflatten(template_def)`."""
    leaves = jax.tree_util.tree_leaves(tree)
    np.savez(path, **{f"leaf_{i:05d}": np.asarray(l) for i, l in enumerate(leaves)})


def load_leaves(path: str | Path) -> list:
    with np.load(path, allow_pickle=False) as data:
        return [data[k] for k in sorted(data.files)]


def load_pytree(path: str | Path) -> Any:
    with np.load(path, allow_pickle=False) as data:
        return _unflatten({k: data[k] for k in data.files})


# ---------------------------------------------------------------------------
# checkpoint directory layout: <exp>/checkpoints/epoch_0007/{params.npz,
# model_state.npz, opt_state.npz, meta.json}


def save_checkpoint(
    ckpt_root: str | Path,
    epoch: int,
    params: Any,
    model_state: Any,
    opt_state: Any = None,
    meta: Optional[Dict] = None,
    max_keep: Optional[int] = None,
    protect: Optional[set] = None,
) -> Path:
    """`protect`: epoch numbers GC must never delete (the Trainer passes the
    best-scoring epoch so every-epoch saving with validation_interval > 1
    cannot garbage-collect the best validated checkpoint)."""
    ckpt_dir = Path(ckpt_root) / f"epoch_{epoch:04d}"
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    save_pytree(ckpt_dir / "params.npz", params)
    save_pytree(ckpt_dir / "model_state.npz", model_state)
    if opt_state is not None:
        save_leaves(ckpt_dir / "opt_state.npz", opt_state)
    (ckpt_dir / "meta.json").write_text(json.dumps({"epoch": epoch, **(meta or {})}))
    if max_keep is not None:
        gc_checkpoints(ckpt_root, max_keep, protect=protect)
    return ckpt_dir


def list_checkpoints(ckpt_root: str | Path) -> List[Path]:
    root = Path(ckpt_root)
    if not root.exists():
        return []
    return sorted(p for p in root.iterdir() if re.fullmatch(r"epoch_\d{4}", p.name))


def gc_checkpoints(ckpt_root: str | Path, max_keep: int,
                   protect: Optional[set] = None) -> None:
    ckpts = list_checkpoints(ckpt_root)
    protected = {f"epoch_{e:04d}" for e in (protect or ())}
    for stale in ckpts[:-max_keep]:
        if stale.name in protected:
            continue
        shutil.rmtree(stale)


def load_checkpoint(ckpt_dir: str | Path):
    ckpt_dir = Path(ckpt_dir)
    params = load_pytree(ckpt_dir / "params.npz")
    model_state = load_pytree(ckpt_dir / "model_state.npz")
    opt_path = ckpt_dir / "opt_state.npz"
    # opt_state comes back as an ordered LEAVES LIST — rebuild with
    # tree_unflatten against the optimizer's template structure
    opt_state = load_leaves(opt_path) if opt_path.exists() else None
    meta = json.loads((ckpt_dir / "meta.json").read_text())
    return params, model_state, opt_state, meta


def latest_checkpoint(ckpt_root: str | Path) -> Optional[Path]:
    ckpts = list_checkpoints(ckpt_root)
    return ckpts[-1] if ckpts else None


# ---------------------------------------------------------------------------
# uniform checkpoint averaging (ckpt_utils.py:16-43)


def average_pytrees(trees: Sequence[Any]) -> Any:
    n = len(trees)
    assert n > 0
    return jax.tree_util.tree_map(
        lambda *leaves: (
            np.mean(np.stack([np.asarray(l, dtype=np.float64) for l in leaves]), axis=0).astype(
                np.asarray(leaves[0]).dtype
            )
            if np.issubdtype(np.asarray(leaves[0]).dtype, np.floating)
            else np.asarray(leaves[0])
        ),
        *trees,
    )


def average_checkpoints(ckpt_dirs: Sequence[str | Path]) -> Any:
    """Uniformly average `params.npz` across checkpoint dirs."""
    return average_pytrees([load_pytree(Path(d) / "params.npz") for d in ckpt_dirs])


# ---------------------------------------------------------------------------
# structured metric summary + best-N selection (ckpt_utils.py:45-100,
# infer_avg.py:274-290)


def append_metrics(exp_dir: str | Path, record: Dict) -> None:
    with open(Path(exp_dir) / "metrics.jsonl", "a") as fh:
        fh.write(json.dumps(record) + "\n")


def load_metrics(exp_dir: str | Path) -> List[Dict]:
    path = Path(exp_dir) / "metrics.jsonl"
    if not path.exists():
        return []
    return [json.loads(line) for line in path.read_text().splitlines() if line.strip()]


def select_checkpoints(
    metrics: List[Dict],
    ckpt_root: str | Path,
    num: int = 5,
    metric: str = "der",
    mode: str = "best",
) -> List[Path]:
    """Select N checkpoint dirs for averaging.

    Reference semantics (recipes/diar_ssl/infer_avg.py:274-290):
    mode='best': the N lowest-metric epochs; 'prev': the N epochs ENDING at
    the best one in epoch order (epochs [best-N+1 .. best] — "to the
    converged moment", same as ckpt_utils.average_ckpt:93-99);
    'center': epochs [best-N//2 .. best+N//2] around the best (N odd in the
    reference recipes). Slices are clamped at epoch 0 instead of wrapping.
    Only epochs whose checkpoint still exists are considered.
    """
    root = Path(ckpt_root)
    existing = {
        int(p.name.split("_")[1]): p for p in list_checkpoints(root)
    }
    rows = [m for m in metrics if m.get("epoch") in existing and metric in m]
    if not rows:
        return []
    if mode == "best":
        rows = sorted(rows, key=lambda m: m[metric])[:num]
        if len(rows) < num:
            warnings.warn(
                f"select_checkpoints(mode='best'): only {len(rows)} of the "
                f"requested {num} checkpoints exist; averaging {len(rows)}",
                stacklevel=2,
            )
    elif mode in ("prev", "center"):
        rows_sorted = sorted(rows, key=lambda m: m["epoch"])
        best_i = int(np.argmin([m[metric] for m in rows_sorted]))
        if mode == "prev":
            lo, hi = best_i - num + 1, best_i + 1
        else:
            lo, hi = best_i - num // 2, best_i + num // 2 + 1
        rows = rows_sorted[max(0, lo) : hi]
        if len(rows) < num:
            # the reference asserts len == avg_ckpt_num and dies
            # (infer_avg.py:286); we average what survives the clamp but
            # never silently — a short average changes the result
            warnings.warn(
                f"select_checkpoints(mode={mode!r}): only {len(rows)} of the "
                f"requested {num} checkpoints exist around the best epoch "
                f"(best at index {best_i}); averaging {len(rows)}",
                stacklevel=2,
            )
    else:
        raise ValueError(f"unknown mode {mode}")
    return [existing[m["epoch"]] for m in rows]
