"""MoFlow — normalizing-flow generative model for molecular graphs.

TPU-native re-design of the reference MoFlow
(``PyTorch/DrugDiscovery/MoFlow/moflow/model/``): a Glow over bond
adjacency tensors (``glow.py Glow``: squeeze → [actnorm → affine
coupling] × K, alternating coupling halves via ``mask_swap``) plus a
graph-conditional flow over atom one-hots (``glow.py GlowOnGraph``:
[actnorm → masked-row graph affine coupling] × K, relational GraphConv
conditioning, ``basic.py:176``), trained by exact NLL in bits/dim with a
learned output variance (``model.py MoFlowLoss``). Dequantization adds
uniform noise scaled by ``noise_scale`` (``model.py forward``).

TPU-first choices: bonds kept NHWC (B, N, N, E) so coupling convs hit the
MXU; all flows unrolled at trace time (static flow count); fp32
throughout (flows are numerically delicate and tiny next to the flagship
models); ``reverse`` is exact and jittable for batch generation.

Deviation: ActNorm uses unit init instead of the reference's
data-dependent first-batch init (awkward under jit; BN inside the
coupling nets covers the stabilization role). Documented, not silent.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["MoFlowConfig", "MoFlow", "MoFlowTask", "ZINC250K_CONFIG"]


@dataclass(frozen=True)
class MoFlowConfig:
    n_node: int = 9  # max atoms (qm9-scale default)
    n_atom_types: int = 5  # incl. the dummy/padding code
    n_bond_types: int = 4  # dummy, single, double, triple
    # bond Glow (reference BondFlowConfig)
    bond_n_flow: int = 10
    bond_squeeze: int = 3
    bond_hidden: tuple[int, ...] = (128, 128)
    # atom flow (reference AtomFlowConfig)
    atom_n_flow: int = 27
    atom_hidden_gnn: tuple[int, ...] = (64,)
    atom_hidden_lin: tuple[int, ...] = (128, 64)
    noise_scale: float = 0.6
    learn_dist: bool = True

    @property
    def b_size(self) -> int:
        return self.n_node * self.n_node * self.n_bond_types

    @property
    def a_size(self) -> int:
        return self.n_node * self.n_atom_types


# reference config.py ZINC250K_CONFIG (max 40 nodes incl. padding, 9 atom
# types + dummy, 38 atom flows, 10 bond flows squeezed 20-fold)
ZINC250K_CONFIG = MoFlowConfig(
    n_node=40, n_atom_types=10, n_bond_types=4,
    bond_n_flow=10, bond_squeeze=20, bond_hidden=(512, 512),
    atom_n_flow=38, atom_hidden_gnn=(256,), atom_hidden_lin=(512, 64),
)


def _sigmoid_inverse(x):
    """1/sigmoid(x), stable (reference ``coupling.py sigmoid_inverse``)."""
    return 1.0 + jnp.exp(-x)


class ActNorm(nn.Module):
    """Per-channel affine with exact logdet (reference ``basic.py:48``;
    unit-init deviation documented in the module docstring)."""

    num_channels: int
    n_elements: int  # product of the non-channel, non-batch dims

    @nn.compact
    def __call__(self, x, reverse: bool = False):
        # channel axis is the LAST axis of x here (NHWC-style layouts)
        loc = self.param("loc", nn.initializers.zeros, (self.num_channels,))
        scale = self.param("scale", nn.initializers.ones, (self.num_channels,))
        if reverse:
            return x / scale - loc
        logdet = self.n_elements * jnp.sum(jnp.log(jnp.abs(scale)))
        return scale * (x + loc), logdet


class AffineCoupling(nn.Module):
    """Bond-tensor coupling (reference ``coupling.py AffineCoupling``):
    conv stack on one channel half predicts (s_logits, t) for the other;
    y_b = (x_b + t) * sigmoid(s_logits)."""

    in_channel: int
    hidden: tuple[int, ...]
    mask_swap: bool

    def _s_t(self, xa, train):
        h = xa
        for i, c in enumerate(self.hidden):
            h = nn.Conv(c, (3, 3), name=f"conv{i}")(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             name=f"bn{i}")(h)
            h = nn.relu(h)
        h = nn.Conv(self.in_channel, (3, 3), name="out")(h)
        return jnp.split(h, 2, axis=-1)

    @nn.compact
    def __call__(self, x, train: bool = True, reverse: bool = False):
        xa, xb = jnp.split(x, 2, axis=-1)
        if self.mask_swap:
            xa, xb = xb, xa
        s_logits, t = self._s_t(xa, train and not reverse)
        if reverse:
            yb = xb * _sigmoid_inverse(s_logits) - t
            parts = (yb, xa) if self.mask_swap else (xa, yb)
            return jnp.concatenate(parts, axis=-1)
        yb = (xb + t) * jax.nn.sigmoid(s_logits)
        logdet = jnp.sum(jax.nn.log_sigmoid(s_logits),
                         axis=tuple(range(1, x.ndim)))
        parts = (yb, xa) if self.mask_swap else (xa, yb)
        return jnp.concatenate(parts, axis=-1), logdet


class BondGlow(nn.Module):
    """Squeeze → n_flow × (actnorm + coupling) → unsqueeze
    (reference ``glow.py Block`` with conv_lu=2: no 1x1 invconv, halves
    alternate via mask_swap)."""

    cfg: MoFlowConfig

    @nn.compact
    def __call__(self, adj, train: bool = True, reverse: bool = False):
        cfg = self.cfg
        b, n, _, e = adj.shape
        f = cfg.bond_squeeze
        sq_ch = e * f * f
        # channel order (e, fh, fw) matches the reference's NCHW squeeze
        # (glow.py:158-166) so converted conv weights map 1:1 and the
        # coupling's channel halves partition identically
        x = adj.reshape(b, n // f, f, n // f, f, e)
        x = x.transpose(0, 1, 3, 5, 2, 4).reshape(b, n // f, n // f, sq_ch)
        elements = (n // f) * (n // f)
        flows = [
            (ActNorm(sq_ch, elements, name=f"actnorm{i}"),
             AffineCoupling(sq_ch, tuple(cfg.bond_hidden), mask_swap=bool(i % 2),
                            name=f"coupling{i}"))
            for i in range(cfg.bond_n_flow)
        ]
        if reverse:
            for actnorm, coupling in reversed(flows):
                x = coupling(x, reverse=True)
                x = actnorm(x, reverse=True)
            logdet = None
        else:
            logdet = 0.0
            for actnorm, coupling in flows:
                x, d1 = actnorm(x)
                x, d2 = coupling(x, train=train)
                logdet = logdet + d1 + d2
        x = x.reshape(b, n // f, n // f, e, f, f)
        x = x.transpose(0, 1, 4, 2, 5, 3).reshape(b, n, n, e)
        return x if reverse else (x, logdet)


class GraphConv(nn.Module):
    """Relational graph conv (reference ``basic.py GraphConv``):
    h = W_self x + sum_e A_e W_e x."""

    out_dim: int
    n_edge: int

    @nn.compact
    def __call__(self, adj, nodes):
        # adj (B, E, N, N); nodes (B, N, C)
        hs = nn.Dense(self.out_dim, name="self")(nodes)
        m = nn.Dense(self.out_dim * self.n_edge, name="edge")(nodes)
        m = m.reshape(nodes.shape[0], nodes.shape[1], self.out_dim, self.n_edge)
        hr = jnp.einsum("bemn,bnce->bmc", adj, m)
        return hs + hr


class GraphAffineCoupling(nn.Module):
    """Masked-row atom coupling (reference ``coupling.py
    GraphAffineCoupling``): rows in ``masked_rows`` stay fixed and drive
    (s, t) for the rest through GraphConv + linear stacks."""

    cfg: MoFlowConfig
    masked_rows: tuple[int, ...]

    def _s_t(self, adj, masked_x, train):
        cfg = self.cfg
        h = masked_x
        # the reference's coupling BatchNorm2d(n_node) normalizes per NODE
        # row (coupling.py:112,129), not per feature — axis=1 here
        for i, d in enumerate(cfg.atom_hidden_gnn):
            h = GraphConv(d, cfg.n_bond_types, name=f"gnn{i}")(adj, h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             axis=1, name=f"gnn_bn{i}")(h)
            h = nn.relu(h)
        for i, d in enumerate(cfg.atom_hidden_lin):
            h = nn.Dense(d, name=f"lin{i}")(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             axis=1, name=f"lin_bn{i}")(h)
            h = nn.relu(h)
        h = nn.Dense(cfg.n_atom_types * 2, name="out")(h)
        return jnp.split(h, 2, axis=-1)

    @nn.compact
    def __call__(self, adj, x, train: bool = True, reverse: bool = False):
        cfg = self.cfg
        mask = jnp.ones((cfg.n_node, 1)).at[jnp.asarray(self.masked_rows)].set(0.0)
        masked_x = mask * x
        s_logits, t = self._s_t(adj, masked_x, train and not reverse)
        if reverse:
            return masked_x + (1 - mask) * (x * _sigmoid_inverse(s_logits) - t)
        s = jax.nn.sigmoid(s_logits)
        out = masked_x + (1 - mask) * (x + t) * s
        # deviation: the reference sums logsigmoid over ALL rows incl. the
        # masked (identity) ones; only unmasked rows change volume, so the
        # mask-weighted sum is the exact logdet
        logdet = jnp.sum(jax.nn.log_sigmoid(s_logits) * (1 - mask),
                         axis=(1, 2))
        return out, logdet


class AtomFlow(nn.Module):
    """GlowOnGraph (reference ``glow.py BlockOnGraph``): flow i masks row
    i % n_node (mask_row_size/stride = 1)."""

    cfg: MoFlowConfig

    @nn.compact
    def __call__(self, adj, x, train: bool = True, reverse: bool = False):
        cfg = self.cfg
        flows = [
            (ActNorm(cfg.n_node, cfg.n_atom_types, name=f"actnorm{i}"),
             GraphAffineCoupling(cfg, (i % cfg.n_node,), name=f"coupling{i}"))
            for i in range(cfg.atom_n_flow)
        ]
        if reverse:
            for actnorm, coupling in reversed(flows):
                x = coupling(adj, x, reverse=True)
                # actnorm channel = node axis: move types to last? the
                # reference normalizes per node row; x is (B, N, T) and the
                # channel axis N is axis 1 — transpose so ActNorm sees it last
                x = actnorm(x.transpose(0, 2, 1), reverse=True).transpose(0, 2, 1)
            return x
        logdet = 0.0
        for actnorm, coupling in flows:
            xt, d1 = actnorm(x.transpose(0, 2, 1))
            x = xt.transpose(0, 2, 1)
            x, d2 = coupling(adj, x, train=train)
            logdet = logdet + d1 + d2
        return x, logdet


class MoFlow(nn.Module):
    cfg: MoFlowConfig

    def setup(self):
        self.bond_glow = BondGlow(self.cfg)
        self.atom_flow = AtomFlow(self.cfg)

    def __call__(self, adj, x, train: bool = True):
        """adj (B, E, N, N) one-hot bonds; x (B, N, T) one-hot atoms
        (noise added by the task). Returns (z_x, z_adj, logdet_x,
        logdet_adj)."""
        z_x, logdet_x = self.atom_flow(adj, x, train=train)
        adj_nhwc = adj.transpose(0, 2, 3, 1)
        z_adj, logdet_adj = self.bond_glow(adj_nhwc, train=train)
        return z_x, z_adj, logdet_x, logdet_adj

    def reverse(self, z):
        """Latent (B, a_size + b_size) -> (adj (B, E, N, N), x (B, N, T)).
        Reference ``model.py MoFlow.reverse``: decode bonds, discretize to
        one-hot via softmax/argmax, then decode atoms conditioned on them."""
        cfg = self.cfg
        b = z.shape[0]
        z_x = z[:, :cfg.a_size].reshape(b, cfg.n_node, cfg.n_atom_types)
        z_adj = z[:, cfg.a_size:].reshape(
            b, cfg.n_node, cfg.n_node, cfg.n_bond_types
        )
        h_adj = self.bond_glow(z_adj, reverse=True)  # (B, N, N, E)
        adj = h_adj.transpose(0, 3, 1, 2)
        adj = (adj + adj.transpose(0, 1, 3, 2)) / 2
        adj = jax.nn.softmax(adj, axis=1)
        # argmax one-hot along the bond-type axis: exactly one active type
        # per pair even on score ties (floor(adj/max) could emit several)
        adj = jax.nn.one_hot(
            jnp.argmax(adj, axis=1), cfg.n_bond_types, axis=1, dtype=adj.dtype
        )
        x = self.atom_flow(adj, z_x, reverse=True)
        return adj, x


@dataclass
class MoFlowTask:
    """Batch: ``atoms`` (B, N, T) one-hot, ``adj`` (B, E, N, N) one-hot."""

    cfg: MoFlowConfig = field(default_factory=MoFlowConfig)
    dtype: Any = jnp.float32  # flows stay fp32 (see module docstring)

    def __post_init__(self):
        self.model = MoFlow(self.cfg)

    def init(self, rng, batch: int = 2):
        cfg = self.cfg
        adj = jnp.zeros((batch, cfg.n_bond_types, cfg.n_node, cfg.n_node))
        x = jnp.zeros((batch, cfg.n_node, cfg.n_atom_types))
        variables = self.model.init(rng, adj, x, train=False)
        params = variables["params"]
        if cfg.learn_dist:
            params = dict(params, ln_var=jnp.zeros((1,)))
        return params, variables.get("batch_stats", {})

    def loss_fn(self, params, model_state, batch, rng):
        cfg = self.cfg
        ln_var = params.get("ln_var", jnp.zeros((1,)))[0]
        model_params = {k: v for k, v in params.items() if k != "ln_var"}
        ra, rx = jax.random.split(rng)
        x = batch["atoms"] + jax.random.uniform(
            rx, batch["atoms"].shape) * cfg.noise_scale
        adj_in = batch["adj"]
        adj_noised = adj_in + jax.random.uniform(
            ra, adj_in.shape) * cfg.noise_scale
        variables = {"params": model_params}
        if model_state:
            variables["batch_stats"] = model_state
        # atom flow conditions on the CLEAN adjacency (reference passes adj
        # to atom_model and the noised copy to bond_model)
        (z_x, logdet_x), new_ms = self.model.apply(
            variables, adj_in, x, train=True,
            method=lambda m, a, xx, train: m.atom_flow(a, xx, train=train),
            mutable=["batch_stats"] if model_state else [],
        )
        variables2 = {"params": model_params}
        if model_state:
            variables2["batch_stats"] = new_ms.get("batch_stats", model_state)
        (z_adj, logdet_adj), new_ms2 = self.model.apply(
            variables2, adj_noised.transpose(0, 2, 3, 1), train=True,
            method=lambda m, a, train: m.bond_glow(a, train=train),
            mutable=["batch_stats"] if model_state else [],
        )
        # NLL per dim in bits (reference MoFlowLoss.forward)
        ln2 = math.log(2.0)

        def nll(z, logdet, size):
            z = z.reshape(z.shape[0], -1)
            logdet = logdet - size * ln2
            gauss = 0.5 * (ln_var + math.log(2 * math.pi)
                           + z * z * jnp.exp(-ln_var))
            return jnp.mean(jnp.sum(gauss, axis=1) - logdet) / (size * ln2)

        nll_x = nll(z_x, logdet_x, cfg.a_size)
        nll_adj = nll(z_adj, logdet_adj, cfg.b_size)
        loss = nll_x + nll_adj
        ms = new_ms2.get("batch_stats", model_state) if model_state \
            else model_state
        return loss, (ms, {"nll_x": nll_x, "nll_adj": nll_adj})

    def generate(self, params, model_state, rng, n: int, temp: float = 0.7):
        """Sample latents at ``temp`` and decode (reference
        ``runtime/generate.py``)."""
        cfg = self.cfg
        model_params = {k: v for k, v in params.items() if k != "ln_var"}
        z = jax.random.normal(rng, (n, cfg.a_size + cfg.b_size)) * temp
        variables = {"params": model_params}
        if model_state:
            variables["batch_stats"] = model_state
        return self.model.apply(variables, z, method=MoFlow.reverse)
