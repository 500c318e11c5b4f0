"""Output parity of the masked-dense TPU backbones against the in-repo torch
oracle (``conan_fgw_tpu/bench_baseline.py``) under transferred weights.

The FGW stack has golden parity vs the reference solver; these tests pin the
*backbone rewrite* the same way: the ragged gather/scatter torch SchNet /
GAT (the reference's dataflow, ``schnet_no_sum.py:144-232``, ``gat.py:5-25``)
and the masked-dense einsum formulation must produce the same numbers given
identical weights — across bucket sizes and the neighbor-cap edge case
(nodes with more than ``max_neighbors`` in-range neighbors, where
torch-cluster's first-(cap+1)-including-self rule is easy to get off by one).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from conan_fgw_tpu.bench_baseline import (  # noqa: E402
    _radius_edges,
    _TorchGATRef,
    _TorchSchNetRef,
)
from conan_fgw_tpu.data.packing import pack_batch  # noqa: E402
from conan_fgw_tpu.data.synthetic import random_dataset  # noqa: E402
from conan_fgw_tpu.models.gat import GAT2D  # noqa: E402
from conan_fgw_tpu.models.schnet import SchNet3D  # noqa: E402

HIDDEN, FILTERS, GAUSS, BLOCKS, CUTOFF, CAP = 64, 64, 25, 3, 10.0, 32


def _t(x):  # flax (in, out) kernel → torch (out, in) weight
    return torch.tensor(np.asarray(x).T.copy(), dtype=torch.float32)


def _copy_schnet_params(params, ref: _TorchSchNetRef):
    p = params["params"]
    with torch.no_grad():
        ref.embedding.weight.copy_(
            torch.tensor(np.asarray(p["embedding"]["embedding"]))
        )
        for i, blk in enumerate(ref.blocks):
            b = p[f"blocks_{i}"]
            blk.filter_net[0].weight.copy_(_t(b["filter_w1"]))
            blk.filter_net[0].bias.copy_(torch.tensor(np.asarray(b["filter_b1"])))
            blk.filter_net[2].weight.copy_(_t(b["filter_w2"]))
            blk.filter_net[2].bias.copy_(torch.tensor(np.asarray(b["filter_b2"])))
            blk.lin1.weight.copy_(_t(b["Dense_0"]["kernel"]))
            blk.lin2.weight.copy_(_t(b["Dense_1"]["kernel"]))
            blk.lin2.bias.copy_(torch.tensor(np.asarray(b["Dense_1"]["bias"])))
            blk.lin.weight.copy_(_t(b["Dense_2"]["kernel"]))
            blk.lin.bias.copy_(torch.tensor(np.asarray(b["Dense_2"]["bias"])))
        for name in ("lin1", "lin2", "lin1_bary", "lin2_bary"):
            getattr(ref, name).weight.copy_(_t(p[name]["kernel"]))
            getattr(ref, name).bias.copy_(torch.tensor(np.asarray(p[name]["bias"])))


def _records():
    # small molecules (bucket 32) + big ones (bucket 64) whose nodes exceed
    # the 32-neighbor cap within the 10 Å cutoff
    small = random_dataset(11, 3, num_conformers=1, heavy_range=(4, 6))
    big = random_dataset(12, 3, num_conformers=1, heavy_range=(26, 30))
    capped = 0
    for r in big:
        d = np.linalg.norm(r.pos[0][:, None] - r.pos[0][None, :], axis=-1)
        capped += int(((d <= CUTOFF).sum(1) - 1 > CAP).sum())
    assert capped > 0, "test molecules never engage the neighbor cap"
    return small + big


class TestSchNetParity:
    def test_dual_head_outputs_match_torch_oracle(self):
        model = SchNet3D(
            hidden_channels=HIDDEN, num_filters=FILTERS, num_gaussians=GAUSS,
            num_interactions=BLOCKS, cutoff=CUTOFF, max_neighbors=CAP,
        )
        recs = _records()
        n_pad = 64
        pb = pack_batch(recs, max_atoms=n_pad, batch_size=len(recs))
        z = jnp.asarray(pb.z[:, 0])  # (B, N) conformer 0
        pos = jnp.asarray(pb.pos[:, 0])
        mask = jnp.asarray(pb.atom_mask)
        params = model.init(jax.random.PRNGKey(3), z, pos, mask)
        h3_j, hb_j, _ = model.apply(params, z, pos, mask, method=SchNet3D.embed_dual)
        h3_j, hb_j = np.asarray(h3_j), np.asarray(hb_j)

        ref = _TorchSchNetRef(
            hidden=HIDDEN, filters=FILTERS, gaussians=GAUSS, blocks=BLOCKS,
            cutoff=CUTOFF,
        )
        _copy_schnet_params(params, ref)
        with torch.no_grad():
            for b, r in enumerate(recs):
                n = r.num_atoms
                ei, dmat = _radius_edges(r.pos[0], CUTOFF, CAP)
                h3_t, hb_t = ref(
                    torch.tensor(r.z, dtype=torch.long),
                    torch.tensor(ei),
                    torch.tensor(dmat[ei[0], ei[1]], dtype=torch.float32),
                )
                np.testing.assert_allclose(
                    h3_j[b, :n], h3_t.numpy(), rtol=2e-4, atol=2e-4,
                    err_msg=f"3D head mismatch, molecule {b} (n={n})",
                )
                np.testing.assert_allclose(
                    hb_j[b, :n], hb_t.numpy(), rtol=2e-4, atol=2e-4,
                    err_msg=f"bary head mismatch, molecule {b} (n={n})",
                )

    def test_stage1_head_matches_oracle_composition(self):
        """``__call__`` (stage-1) keeps the reference quirk lin1→lin2→act —
        equal to act(lin2(lin1(h))), i.e. the oracle's h3."""
        model = SchNet3D(
            hidden_channels=HIDDEN, num_filters=FILTERS, num_gaussians=GAUSS,
            num_interactions=BLOCKS, cutoff=CUTOFF, max_neighbors=CAP,
        )
        recs = _records()[:2]
        pb = pack_batch(recs, max_atoms=32, batch_size=len(recs))
        z, pos, mask = (
            jnp.asarray(pb.z[:, 0]), jnp.asarray(pb.pos[:, 0]),
            jnp.asarray(pb.atom_mask),
        )
        params = model.init(jax.random.PRNGKey(5), z, pos, mask)
        h_call = np.asarray(model.apply(params, z, pos, mask))
        h_dual = np.asarray(
            model.apply(params, z, pos, mask, method=SchNet3D.embed_dual)[0]
        )
        np.testing.assert_allclose(h_call, h_dual, rtol=1e-6)


class TestGATParity:
    def test_two_layer_readout_matches_torch_oracle(self):
        recs = _records()
        n_pad = 64
        pb = pack_batch(recs, max_atoms=n_pad, batch_size=len(recs))
        gat = GAT2D(out_channels=48)
        x2d = jnp.asarray(pb.x2d)
        adj = jnp.asarray(pb.bond_adj).astype(bool)
        attr = jnp.asarray(pb.bond_attr)
        mask = jnp.asarray(pb.atom_mask)
        params = gat.init(jax.random.PRNGKey(7), x2d, adj, attr, mask)
        out_j = np.asarray(gat.apply(params, x2d, adj, attr, mask))

        ref = _TorchGATRef(in_dim=pb.x2d.shape[-1], out=48, edge_dim=attr.shape[-1])
        p = params["params"]
        with torch.no_grad():
            for i, layer in enumerate((ref.l1, ref.l2)):
                d = p[f"DenseGATConv_{i}"]
                layer.lin.weight.copy_(_t(d["Dense_0"]["kernel"]))
                layer.lin_e.weight.copy_(_t(d["Dense_1"]["kernel"]))
                layer.a_src.copy_(torch.tensor(np.asarray(d["att_src"][0])))
                layer.a_dst.copy_(torch.tensor(np.asarray(d["att_dst"][0])))
                layer.a_edge.copy_(torch.tensor(np.asarray(d["att_edge"][0])))
                layer.bias.copy_(torch.tensor(np.asarray(d["bias"])))
            for b, r in enumerate(recs):
                be = np.concatenate([r.bonds, r.bonds[:, ::-1]], 0).T
                ba = np.concatenate([r.bond_attr, r.bond_attr], 0)
                out_t = ref(
                    torch.tensor(r.x2d, dtype=torch.float32),
                    torch.tensor(be, dtype=torch.long),
                    torch.tensor(ba, dtype=torch.float32),
                )
                np.testing.assert_allclose(
                    out_j[b], out_t.numpy(), rtol=2e-4, atol=2e-4,
                    err_msg=f"GAT readout mismatch, molecule {b}",
                )
