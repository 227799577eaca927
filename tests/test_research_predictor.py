"""ResearchPairPredictor (eval3 options) tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcnbmp_tpu.chem import GGNNFeaturizer, mol_from_smiles
from gcnbmp_tpu.data.dataset import PairDataset, make_batch
from gcnbmp_tpu.models.coattention import build_coattention
from gcnbmp_tpu.models.ggnn_dev import GGNNDev
from gcnbmp_tpu.models.heads import HolEHead, MLPHead
from gcnbmp_tpu.models.predictor import ResearchPairPredictor


def _batch():
    f = GGNNFeaturizer()
    ds = PairDataset()
    for s1, s2, y in [("CCO", "c1ccccc1", 1), ("CC(=O)O", "C=O", 0)]:
        ds.append(f(mol_from_smiles(s1)), f(mol_from_smiles(s2)), np.float32(y))
    return make_batch(ds, [0, 1])


def _args(batch):
    return (jnp.asarray(batch.atoms1), jnp.asarray(batch.adj1),
            jnp.asarray(batch.atoms2), jnp.asarray(batch.adj2),
            jnp.asarray(batch.mask1), jnp.asarray(batch.mask2))


@pytest.mark.parametrize("s_lstm,i_lstm", [(False, False), (True, False),
                                           (False, True), (True, True)])
def test_research_predictor_mlp(s_lstm, i_lstm):
    batch = _batch()
    pred = ResearchPairPredictor(
        encoder=GGNNDev(out_dim=8, hidden_dim=8, n_layers=3,
                        sum_pool_readout=False, name="encoder"),
        head=MLPHead(out_dim=1, hidden_dims=(8,), name="head"),
        coattention=build_coattention("para", hidden_dim=16, out_dim=8),
        use_s_lstm=s_lstm, use_i_lstm=i_lstm,
    )
    variables = pred.init(jax.random.PRNGKey(0), *_args(batch))
    out = pred.apply(variables, *_args(batch))
    assert out.shape == (2, 1) and np.isfinite(np.asarray(out)).all()
    if s_lstm:
        assert "s_lstm_1" in variables["params"]
    if i_lstm:
        assert "i_lstm" in variables["params"]


def test_research_predictor_pair_head_and_nonsiamese():
    batch = _batch()
    pred = ResearchPairPredictor(
        encoder=GGNNDev(out_dim=8, hidden_dim=8, n_layers=2,
                        sum_pool_readout=False, name="encoder"),
        encoder2=GGNNDev(out_dim=8, hidden_dim=8, n_layers=2,
                         sum_pool_readout=False, name="encoder2"),
        head=HolEHead(out_dim=1, hidden_dims=(), name="head"),
        coattention=build_coattention("nie", hidden_dim=16, out_dim=8),
        use_s_lstm=True,
    )
    variables = pred.init(jax.random.PRNGKey(0), *_args(batch))
    out = pred.apply(variables, *_args(batch))
    assert out.shape == (2, 1) and np.isfinite(np.asarray(out)).all()
    assert "encoder2" in variables["params"]  # separate weights
