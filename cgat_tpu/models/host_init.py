"""Host-side (numpy) parameter initialisation.

``jax.eval_shape`` gives the parameter tree without executing anything; the
values are then sampled with numpy following the same distributions as the
flax initialisers in this package (torch-default uniform bounds, kaiming
normals for hypernetwork FCBlocks, N(0,1) embeddings, zeros for ReZero...).

Two reasons to prefer this over running ``model.init`` on device:
* the flax init of the flagship model is one giant executable (~2 min to
  compile over the TPU tunnel), while numpy sampling is instant;
* on the axon TPU runtime, processes that execute the init computation (or
  copy its outputs device->host) dispatch *all subsequent* train steps ~20x
  slower — a measured runtime pathology. Keeping init off-device sidesteps it.

Values are drawn from the same distributions but are not bit-identical to
``model.init`` (different RNG streams); training dynamics are unaffected.
"""
from __future__ import annotations

import jax
import numpy as np


def _fan_in_for_bias(siblings: dict, name: str):
    """The matching kernel's fan-in for a bias leaf."""
    if name == "bias" and "kernel" in siblings:
        return siblings["kernel"].shape[0]
    if name == "fc_in_bias" and "fc_in_kernel" in siblings:
        return siblings["fc_in_kernel"].shape[2]
    if name == "fc_out_bias" and "fc_out_kernel" in siblings:
        return siblings["fc_out_kernel"].shape[2]
    if name.endswith("_bias"):
        k = name[: -len("_bias")] + "_kernel"
        if k in siblings:
            return siblings[k].shape[0]
    return None


def _sample(rng: np.random.Generator, path: tuple, name: str,
            leaf, siblings: dict) -> np.ndarray:
    shape = tuple(leaf.shape)
    dtype = np.dtype(leaf.dtype)
    in_hyper = any("hypo_params" in p for p in path)

    if name == "alpha" and any(p.startswith("rezero") for p in path):
        return np.zeros(shape, dtype)
    if name == "damping":
        return rng.random(shape).astype(dtype)           # torch.rand
    if name.endswith("pow"):
        return rng.standard_normal(shape).astype(dtype)  # torch.randn
    if name == "embedding" and path and path[-1] == "nbr_embedding":
        return rng.standard_normal(shape).astype(dtype)  # nn.Embed N(0,1)

    fan_in_b = _fan_in_for_bias(siblings, name)
    if fan_in_b is not None:
        bound = 1.0 / np.sqrt(fan_in_b)
        return rng.uniform(-bound, bound, shape).astype(dtype)

    if name.endswith("kernel") and in_hyper:
        # FCBlock kaiming_normal(fan_in); last layer additionally * 0.1
        fan_in = shape[0]
        w = rng.standard_normal(shape) * np.sqrt(2.0 / fan_in)
        if name == "fc_last_kernel":
            w = w * 0.1
        return w.astype(dtype)
    if name.endswith("kernel"):
        # torch Linear / grouped-conv default: U(+-1/sqrt(fan_in)).
        # MultiHeadNetwork kernels are (H, out, in): fan_in = last dim.
        fan_in = shape[-1] if len(shape) == 3 else shape[0]
        bound = 1.0 / np.sqrt(fan_in)
        return rng.uniform(-bound, bound, shape).astype(dtype)

    raise ValueError(f"no init rule for parameter {'/'.join(path)}/{name} "
                     f"with shape {shape}")


def init_params_host(model, example_batch, seed: int = 0):
    """Numpy parameter tree matching ``model.init(key, batch)['params']``."""
    shapes = jax.eval_shape(
        lambda b: model.init(jax.random.key(0), b), example_batch)["params"]
    rng = np.random.default_rng(seed)

    def walk(tree, path):
        if not isinstance(tree, dict):
            raise TypeError(f"unexpected leaf at {path}")
        out = {}
        for name in sorted(tree):
            sub = tree[name]
            if isinstance(sub, dict):
                out[name] = walk(sub, path + (name,))
            else:
                out[name] = _sample(rng, path, name, sub, tree)
        return out

    return walk(shapes, ())
