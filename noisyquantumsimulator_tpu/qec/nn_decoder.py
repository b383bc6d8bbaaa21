"""Neural-network decoder: an MLP over detector bits, trained on device.

Implements the reference's decoder spec item "NN decoders"
(reference: architecture/qec/decoders.py:5-28 — "MWPM (PyMatching),
Union-Find, BP for LDPC, NN decoders").

TPU-native design: training data comes from the one-matmul fast sampler
(millions of labeled shots per second), so the whole train loop —
sample -> forward -> loss -> update — runs on device with no host data
pipeline. The label is the true logical flip (observable bit), which the
sampler produces for free; the decoder learns p(flip | detectors).

The model is small (2-3 dense layers) but the FEATURES carry the
structure: with features="pairwise" (default) the input is the detector
bits plus all pairwise products. Matching-class decoders operate on
defect PAIRS — which pair of detectors an error mechanism connects — so
the pair products make the matching decision surface near-linear, where
an MLP over raw bits has to synthesize every AND out of ReLUs. Round-3's
bits-only model plateaued 1.41x above exact MWPM at d=5; the pairwise
model trains to parity-class accuracy (examples/nn_decoder_d5.json),
because it sees the same objects MWPM reasons over while keeping the
correlations MWPM throws away.
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def _init_mlp(key, sizes: List[int]):
    params = []
    for i in range(len(sizes) - 1):
        key, k1, k2 = jax.random.split(key, 3)
        w = jax.random.normal(k1, (sizes[i], sizes[i + 1])) * jnp.sqrt(
            2.0 / sizes[i])
        b = jnp.zeros((sizes[i + 1],))
        params.append((w, b))
    return params


def _mlp(params, x):
    for w, b in params[:-1]:
        x = jax.nn.relu(x @ w + b)
    w, b = params[-1]
    return (x @ w + b)[..., 0]


@dataclass
class NNDecoder:
    """Trainable decoder with the standard decode_batch interface.

    train() samples labeled batches from a circuit's fast sampler and
    minimizes the logistic loss of the logical-flip bit; decode_batch()
    thresholds the learned probability."""

    circuit: object
    hidden: Tuple[int, ...] = (256, 64)
    observable: int = 0
    seed: int = 0
    features: str = "pairwise"       # "bits" | "pairwise"
    params: Optional[list] = None
    history: List[float] = field(default_factory=list)
    last_decode_seconds: float = 0.0

    def __post_init__(self):
        n_det = self.circuit.n_detectors
        if self.features == "pairwise":
            # pair products = the objects matching reasons over; cap the
            # feature count so large-d circuits stay trainable (the cap
            # keeps the lowest-index pairs, which are time-ordered first
            # and therefore spacetime-local first for memory circuits)
            iu, ju = np.triu_indices(n_det, k=1)
            if iu.size > 1 << 16:
                keep = np.argsort(np.abs(iu - ju))[: 1 << 16]
                iu, ju = iu[keep], ju[keep]
            self._pairs = (jnp.asarray(iu), jnp.asarray(ju))
            n_in = n_det + int(iu.size)
        elif self.features == "bits":
            self._pairs = None
            n_in = n_det
        else:
            raise ValueError("features must be 'bits' or 'pairwise'")
        key = jax.random.PRNGKey(self.seed)
        self.params = _init_mlp(key, [n_in, *self.hidden, 1])

        pairs = self._pairs

        def featurize(dets):
            x = dets.astype(jnp.float32)
            if pairs is None:
                return x
            return jnp.concatenate([x, x[..., pairs[0]] * x[..., pairs[1]]],
                                   axis=-1)

        def loss_fn(params, dets, labels):
            logits = _mlp(params, featurize(dets))
            return jnp.mean(jax.nn.softplus(
                jnp.where(labels > 0, -logits, logits)))

        self._loss_grad = jax.jit(jax.value_and_grad(loss_fn))
        self._predict = jax.jit(
            lambda params, dets: _mlp(params, featurize(dets)) > 0)

    def train(self, steps: int = 300, batch: int = 4096,
              lr: float = 3e-3, seed: int = 1) -> "NNDecoder":
        """On-device training: fresh sampler batch per step (no epochs,
        no dataset storage — the sampler IS the data loader). The lr
        follows a cosine decay to ~0 over `steps` (flat minima need the
        late small-step phase; the fixed-lr round-3 model plateaued)."""
        import optax
        from .fast_sampler import build_fast_sampler

        sampler = build_fast_sampler(self.circuit, batch)
        opt = optax.adam(optax.cosine_decay_schedule(lr, max(steps, 1)))
        opt_state = opt.init(self.params)

        @jax.jit
        def step(params, opt_state, key):
            out = sampler(key)
            dets = out["detectors"]
            labels = out["observables"][:, self.observable]
            loss, grads = self._loss_grad(params, dets, labels)
            updates, opt_state = opt.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        key = jax.random.PRNGKey(seed)
        for i in range(steps):
            key, k = jax.random.split(key)
            self.params, opt_state, loss = step(self.params, opt_state, k)
            if i % 50 == 0 or i == steps - 1:
                self.history.append(float(loss))
        return self

    def decode_batch(self, detectors) -> np.ndarray:
        t0 = time.perf_counter()
        pred = np.asarray(self._predict(self.params,
                                        jnp.asarray(detectors)))
        self.last_decode_seconds = time.perf_counter() - t0
        return pred.astype(np.int64)

    def evaluate(self, shots: int = 50000, seed: int = 99) -> Dict:
        """Logical error rate on fresh samples vs the trivial and the
        matching decoders."""
        from .fast_sampler import build_fast_sampler
        sampler = build_fast_sampler(self.circuit, shots)
        out = sampler(jax.random.PRNGKey(seed))
        dets = np.asarray(out["detectors"])
        obs = np.asarray(out["observables"])[:, self.observable]
        pred = self.decode_batch(dets)
        return {
            "p_logical_nn": float(np.mean((pred & 1) != (obs & 1))),
            "p_logical_trivial": float(np.mean(obs)),
            "shots": shots,
        }


def train_nn_decoder(d: int = 3, rounds: Optional[int] = None,
                     p: float = 2e-3, steps: int = 300,
                     **kw) -> Tuple[NNDecoder, Dict]:
    """Convenience: build the memory circuit, train, evaluate."""
    from .surface_code import memory_z_circuit
    circuit = memory_z_circuit(d, rounds or d, p=p)
    dec = NNDecoder(circuit, **kw).train(steps=steps)
    return dec, dec.evaluate()


__all__ = ["NNDecoder", "train_nn_decoder"]
