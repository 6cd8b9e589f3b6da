"""LeapfrogLayer (s, t, q) networks as plain JAX pytrees.

Functional counterpart of the reference's torch modules
(reference src/l2hmc/network/pytorch/network.py): `InputLayer` (:349-451)
= two linear embeddings summed then activated, hidden MLP stack (:492-495),
heads `scale`/`transf` = ScaledTanh `exp(coeff) * tanh(Wz+b)` (:175-206)
and `transl` = Linear (:499-501), optional dropout (:503) / batch norm
(:507), and NetWeight output scaling (:548-551). An optional conv stack
with periodic padding (:151-172, :240-346) can front the x input.

Everything is an explicit pytree of arrays so per-leapfrog-step networks
stack along a leading axis and feed `lax.scan` (see models/dynamics.py);
there is no module system and no lazy shape inference — input dims are
computed from the lattice shape at init.

TPU notes: all matmuls run in the params' dtype (f32 by default, bf16
optional via config precision) and batch over the chain axis, which is the
sharded mesh axis — so every layer is a single MXU-friendly (nb, din) x
(din, dout) GEMM.
"""
from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from l2hmc_tpu.configs import ConvolutionConfig, NetWeight, NetworkConfig

ACTIVATIONS: dict[str, Callable] = {
    "relu": jax.nn.relu,
    "leaky_relu": lambda x: jax.nn.leaky_relu(x, negative_slope=0.01),
    "tanh": jnp.tanh,
    "elu": jax.nn.elu,
    "gelu": jax.nn.gelu,
    "swish": jax.nn.swish,
    "silu": jax.nn.swish,
    "sigmoid": jax.nn.sigmoid,
    "identity": lambda x: x,
}


def _linear_init(key, din: int, dout: int, dtype) -> dict:
    """torch.nn.Linear default init: U(-1/sqrt(din), 1/sqrt(din))."""
    bound = 1.0 / math.sqrt(din)
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.uniform(kw, (din, dout), dtype, -bound, bound),
        "b": jax.random.uniform(kb, (dout,), dtype, -bound, bound),
    }


def _linear(p: dict, z: jax.Array) -> jax.Array:
    return z @ p["w"] + p["b"]


def _scaled_tanh_init(key, din: int, dout: int, dtype) -> dict:
    p = _linear_init(key, din, dout, dtype)
    p["coeff"] = jnp.zeros((1, dout), dtype)
    return p


def _scaled_tanh(p: dict, z: jax.Array) -> jax.Array:
    return jnp.exp(p["coeff"]) * jnp.tanh(_linear(p, z))


# ---------------------------------------------------------------------------
# Conv stack (optional U(1) front-end; network.py:240-346)
# ---------------------------------------------------------------------------
def init_conv_stack(key, conv: ConvolutionConfig, in_channels: int,
                    hw: tuple[int, int], out_dim: int, dtype) -> dict:
    """Periodic-padded conv stack + flatten + linear head."""
    layers = []
    c_in = in_channels
    h, w = hw
    keys = jax.random.split(key, len(conv.filters) + 1)
    for i, (f, ksize) in enumerate(zip(conv.filters, conv.sizes)):
        bound = 1.0 / math.sqrt(c_in * ksize * ksize)
        kw, kb = jax.random.split(keys[i])
        # static layer structure (kernel size / pooling) lives in the
        # ConvolutionConfig, not in the params pytree, so stacked per-step
        # params stay pure arrays
        layers.append({
            "w": jax.random.uniform(
                kw, (f, c_in, ksize, ksize), dtype, -bound, bound),
            "b": jax.random.uniform(kb, (f,), dtype, -bound, bound),
        })
        c_in = f
        # periodic pad (k-1) each side then VALID conv: H -> H + (k - 1)
        h += ksize - 1
        w += ksize - 1
        if (i + 1) % 2 == 0:
            h //= conv.pool[i]
            w //= conv.pool[i]
    flat = c_in * h * w
    head = _linear_init(keys[-1], flat, out_dim, dtype)
    return {"layers": layers, "head": head}


def _periodic_pad(x: jax.Array, size: int) -> jax.Array:
    """Wrap-pad the two trailing spatial dims (network.py:151-172)."""
    if size <= 0:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (size, size), (size, size)),
                   mode="wrap")


def apply_conv_stack(p: dict, x: jax.Array, activation: Callable,
                     conv: ConvolutionConfig, channels: int,
                     hw: tuple[int, int]) -> jax.Array:
    """x: (nb, features) viewed as (nb, C, H, W) -> (nb, out_dim)."""
    nb = x.shape[0]
    z = x.reshape(nb, channels, *hw)
    for i, layer in enumerate(p["layers"]):
        ksize = conv.sizes[i]
        z = _periodic_pad(z, ksize - 1)
        z = jax.lax.conv_general_dilated(
            z, layer["w"], window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        ) + layer["b"][None, :, None, None]
        if (i + 1) % 2 == 0 and conv.pool[i] > 1:
            k = conv.pool[i]
            z = jax.lax.reduce_window(
                z, -jnp.inf, jax.lax.max, (1, 1, k, k), (1, 1, k, k), "VALID"
            )
        z = activation(z)
    z = z.reshape(nb, -1)
    return activation(_linear(p["head"], z))


# ---------------------------------------------------------------------------
# LeapfrogLayer
# ---------------------------------------------------------------------------
def init_leapfrog_layer(
    key: jax.Array,
    *,
    x_dim: int,
    v_dim: int,
    out_dim: int,
    cfg: NetworkConfig,
    conv: Optional[ConvolutionConfig] = None,
    conv_channels: int = 0,
    conv_hw: Optional[tuple[int, int]] = None,
    dtype=jnp.float32,
) -> dict:
    """Initialize one LeapfrogLayer's parameter pytree.

    x_dim/v_dim: flattened feature dims of the two inputs (after any group
    coordinate rep is applied by the caller, e.g. U(1) [cos, sin] doubles
    x_dim; network.py:605-619). out_dim: flattened target dim of (s, t, q).
    """
    units = list(cfg.units)
    n_hidden = len(units) - 1
    keys = jax.random.split(key, 6 + n_hidden)
    params: dict[str, Any] = {
        "xlayer": _linear_init(keys[0], x_dim, units[0], dtype),
        "vlayer": _linear_init(keys[1], v_dim, units[0], dtype),
        "hidden": [
            _linear_init(keys[2 + i], units[i], units[i + 1], dtype)
            for i in range(n_hidden)
        ],
        "scale": _scaled_tanh_init(keys[2 + n_hidden], units[-1], out_dim, dtype),
        "transl": _linear_init(keys[3 + n_hidden], units[-1], out_dim, dtype),
        "transf": _scaled_tanh_init(keys[4 + n_hidden], units[-1], out_dim, dtype),
    }
    if cfg.zero_init_heads:
        # (s, t, q) == 0 at init => the untrained kernel IS plain HMC
        # (gradients still flow: the heads' inputs are non-zero)
        for head in ("scale", "transl", "transf"):
            params[head] = {k: jnp.zeros_like(v)
                            for k, v in params[head].items()}
    if cfg.use_batch_norm:
        params["bn"] = {
            "gamma": jnp.ones((units[-1],), dtype),
            "beta": jnp.zeros((units[-1],), dtype),
            # EMA running statistics (torch BatchNorm1d semantics,
            # reference network.py:507): updated by the Trainer from the
            # batch stats the kernel emits (zero-gradient leaves — the
            # optimizer never touches them), consumed at eval when
            # cfg.bn_track_running_stats
            "r_mean": jnp.zeros((units[-1],), dtype),
            "r_var": jnp.ones((units[-1],), dtype),
        }
    if conv is not None and conv.filters:
        assert conv_hw is not None
        params["conv"] = init_conv_stack(
            keys[5 + n_hidden], conv, conv_channels, conv_hw, x_dim, dtype
        )
    return params


def apply_leapfrog_layer(
    params: dict,
    x: jax.Array,
    v: jax.Array,
    *,
    cfg: NetworkConfig,
    net_weight: NetWeight,
    training: bool = False,
    dropout_key: Optional[jax.Array] = None,
    conv: Optional[ConvolutionConfig] = None,
    conv_channels: int = 0,
    conv_hw: Optional[tuple[int, int]] = None,
    compute_dtype=None,
    collect_bn: bool = False,
):
    """(x, v) -> (s, t, q), each (nb, out_dim).

    Batch norm matches torch nn.BatchNorm1d (reference network.py:507):
    training normalizes with batch statistics; eval normalizes with the
    EMA running statistics in params["bn"] when
    cfg.bn_track_running_stats (else batch stats, the round-1/2
    behavior). collect_bn=True (training only) returns a 4th element
    (batch_mean, batch_var) of shape (units[-1],) each — or None when no
    BN ran — so the Trainer can maintain the EMA outside the kernel.

    compute_dtype (e.g. jnp.bfloat16) runs the GEMM stack in reduced
    precision (params stay f32 in the optimizer; casts are folded by XLA —
    the mixed-precision analogue of the reference's fp16 autocast,
    trainers/pytorch/trainer.py:211-219). Outputs are cast back to the
    input dtype.
    """
    act = ACTIVATIONS[cfg.activation_fn]
    out_dtype = x.dtype
    if compute_dtype is not None:
        params = jax.tree_util.tree_map(
            lambda a: a.astype(compute_dtype), params)
        x = x.astype(compute_dtype)
        v = v.astype(compute_dtype)
    if "conv" in params:
        x = apply_conv_stack(params["conv"], x, act, conv, conv_channels,
                             conv_hw)
    z = act(_linear(params["xlayer"], x) + _linear(params["vlayer"], v))
    for h in params["hidden"]:
        z = act(_linear(h, z))
    if training and cfg.dropout_prob > 0 and dropout_key is not None:
        keep = 1.0 - cfg.dropout_prob
        mask = jax.random.bernoulli(dropout_key, keep, z.shape)
        z = jnp.where(mask, z / keep, 0.0)
    bn_stats = None
    if cfg.use_batch_norm and "bn" in params:
        use_running = (not training and cfg.bn_track_running_stats
                       and "r_mean" in params["bn"])
        if use_running:
            mean = params["bn"]["r_mean"][None, :]
            var = params["bn"]["r_var"][None, :]
        else:
            mean = jnp.mean(z, axis=0, keepdims=True)
            var = jnp.var(z, axis=0, keepdims=True)
            if collect_bn:
                bn_stats = (mean[0], var[0])
        z = (z - mean) * jax.lax.rsqrt(var + 1e-5)
        z = z * params["bn"]["gamma"] + params["bn"]["beta"]
    s = net_weight.s * _scaled_tanh(params["scale"], z)
    t = net_weight.t * _linear(params["transl"], z)
    q = net_weight.q * _scaled_tanh(params["transf"], z)
    if compute_dtype is not None:
        s = s.astype(out_dtype)
        t = t.astype(out_dtype)
        q = q.astype(out_dtype)
        if bn_stats is not None:
            bn_stats = (bn_stats[0].astype(out_dtype),
                        bn_stats[1].astype(out_dtype))
    if collect_bn:
        return s, t, q, bn_stats
    return s, t, q


# The reference's `dummy_network` (identically-zero (s, t, q) for
# network-free mode, reference network.py:69-77) has two native
# counterparts here instead of a stub function: the dedicated HMC kernel
# (models/dynamics.py transition_kernel_hmc — zero nets collapse the
# generalized leapfrog to exactly it) and cfg.network.zero_init_heads,
# which makes the TRAINABLE kernel start at the dummy-network point.


def count_params(tree) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))


def stack_layers(layers: Sequence[dict]) -> dict:
    """Stack per-leapfrog-step parameter pytrees along a new leading axis
    so `lax.scan` can slice one layer per step."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)
