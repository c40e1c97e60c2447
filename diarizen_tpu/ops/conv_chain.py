"""Pallas fused kernel for the WavLM conv front-end chain (layers 1-6).

The extractor's intermediate activations dominate its HBM traffic: layer-1
output alone is (B, ~25.6k, 512) — ~840 MB bf16 per 32x8s batch, written and
re-read once per layer by XLA's unfused convs. This kernel runs the SIX
stride-2 conv+GELU stages (kernels [3,3,3,3,2,2], reference
components.py:1219-1221) entirely in VMEM per output tile: HBM sees only the
layer-1 input (read once, via manual overlapping-tile DMA) and the final
(B, T_out, 512) output.

Each conv is computed as even/odd phase matmuls
    y[t] = x[2t] w0 + x[2t+1] w1 (+ x[2t+2] w2)
on the MXU (phase split = one in-VMEM reshape per stage).

Applies to the unpruned 512-channel Base/Large conv stack. Layer 0 (conv
k=10 s=5 + GroupNorm + GELU) stays in XLA — GroupNorm needs global stats.

STATUS: correct (parity-tested, max diff 2e-4 vs XLA on TPU) but NOT enabled
in the model: measured 17.5 ms vs 12.3 ms for XLA's conv chain on v5e at
batch 32x8s — the per-stage (L, C) -> (L/2, 2C) phase relayout in VMEM costs
more than the HBM traffic it saves (XLA's chain already runs at ~51% MXU).
Retained as the starting point for future Mosaic tuning (strided vector
loads would remove the relayout).
"""

from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TO = 32  # output frames per tile
STRIDE_TOTAL = 64  # product of the 6 stride-2 stages
L_IN = 2080  # input frames needed per tile: (TO-1)*64 + rf(95), rounded even
KERNELS = (3, 3, 3, 3, 2, 2)
# per-stage output lengths computed inside the tile (bottom-up, even-padded)
CHAIN = (1038, 518, 258, 128, 64, 32)
C = 512


def _erf(x):
    """Abramowitz-Stegun 7.1.26 rational erf (|err| < 1.5e-7 in f32) —
    Mosaic has no erf/erfc lowering; this is below bf16 resolution anyway."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu(x):
    xf = x.astype(jnp.float32)
    return (0.5 * xf * (1.0 + _erf(xf * 0.7071067811865476))).astype(x.dtype)


def _conv_stage(x, w, kernel: int, t_out: int):
    """x: (L, C) even L -> (t_out, C); stride-2 conv as phase matmuls."""
    l = x.shape[0]
    pairs = x.reshape(l // 2, 2 * C)
    even, odd = pairs[:, :C], pairs[:, C:]
    y = jax.lax.dot_general(
        even[:t_out], w[0], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    y = y + jax.lax.dot_general(
        odd[:t_out], w[1], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    if kernel == 3:
        y = y + jax.lax.dot_general(
            even[1 : t_out + 1], w[2], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return _gelu(y).astype(x.dtype)


def _kernel(x_hbm, w1, w2, w3, w4, w5, w6, o_ref, x_vmem, sem):
    b = pl.program_id(0)
    j = pl.program_id(1)
    start = pl.multiple_of(j * (TO * STRIDE_TOTAL), TO * STRIDE_TOTAL)
    cp = pltpu.make_async_copy(x_hbm.at[b, pl.ds(start, L_IN), :], x_vmem, sem)
    cp.start()
    cp.wait()

    x = x_vmem[:]
    for w_ref, kernel, t_out in zip((w1, w2, w3, w4, w5, w6), KERNELS, CHAIN):
        x = _conv_stage(x, w_ref, kernel, t_out)
    o_ref[0] = x


def fused_conv_chain(
    x1: jnp.ndarray, weights: List[jnp.ndarray], t_out: int,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """x1: (B, T1, 512) layer-1 input (post conv0+GN+GELU); weights: six
    (k, 512, 512) conv kernels; returns (B, t_out, 512)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, t1, c = x1.shape
    assert c == C
    n_tiles = -(-t_out // TO)
    # pad so the last tile's DMA window is in bounds
    need = (n_tiles - 1) * TO * STRIDE_TOTAL + L_IN
    if t1 < need:
        x1 = jnp.pad(x1, ((0, 0), (0, need - t1), (0, 0)))

    wargs = [w.astype(x1.dtype) for w in weights]
    out = pl.pallas_call(
        _kernel,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # x1 stays in HBM, manual DMA
            *[
                pl.BlockSpec(
                    (k, C, C), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM
                )
                for k in KERNELS
            ],
        ],
        out_specs=pl.BlockSpec((1, TO, C), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles * TO, C), x1.dtype),
        scratch_shapes=[
            pltpu.VMEM((L_IN, C), x1.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x1, *wargs)
    return out[:, :t_out]


def xla_conv_chain(x1: jnp.ndarray, weights: List[jnp.ndarray], t_out: int) -> jnp.ndarray:
    """Oracle/fallback: the same chain as plain XLA convs."""
    x = x1
    for w, kernel in zip(weights, KERNELS):
        x = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (2,), [(0, 0)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        x = jax.nn.gelu(x, approximate=False)  # exact erf (torch parity)
    return x[:, :t_out]
