"""Full-model forward/grad with the Pallas backend (interpret mode) vs XLA."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cgat_tpu.data import collate
from cgat_tpu.data.synthetic import random_graphs
from cgat_tpu.models import CGATConfig, CGAtNet
from cgat_tpu.ops import attention as att
from cgat_tpu.ops.pallas import segment_attention as sa


@pytest.fixture
def pallas_interpret():
    old_backend, old_interp = att.get_backend(), sa.INTERPRET
    att.set_backend("pallas")
    sa.INTERPRET = True
    yield
    att.set_backend(old_backend)
    sa.INTERPRET = old_interp


def test_model_forward_and_grad_with_pallas_backend(pallas_interpret):
    # elem_fea_len 128 so HF = heads*128 is lane-aligned (pallas-eligible)
    cfg = CGATConfig(orig_elem_fea_len=16, elem_fea_len=128, n_graph=1,
                     nbr_embedding_size=16, neighbor_number=4, msg_heads=2,
                     n_graph_roost=1, out_hidden=(16,))
    graphs = random_graphs(0, 3, n_atoms_range=(3, 6), max_nbr=4, orig_fea=16)
    batch = collate(graphs, max_nbr=4, node_bucket=8)
    model = CGAtNet(cfg)
    params = model.init(jax.random.key(0), batch)["params"]

    out_p = np.asarray(model.apply({"params": params}, batch))
    att.set_backend("xla")
    out_x = np.asarray(model.apply({"params": params}, batch))
    att.set_backend("pallas")
    np.testing.assert_allclose(out_p, out_x, rtol=2e-4, atol=1e-5)

    def loss(p, backend):
        att.set_backend(backend)
        o = model.apply({"params": p}, batch)
        return jnp.mean(jnp.where(batch.graph_mask,
                                  jnp.abs(o[:, 0] - batch.target), 0.0))

    g_p = jax.grad(lambda p: loss(p, "pallas"))(params)
    g_x = jax.grad(lambda p: loss(p, "xla"))(params)
    for a, b in zip(jax.tree.leaves(g_p), jax.tree.leaves(g_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-5)
