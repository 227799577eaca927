"""Featurizer + batching tests."""

import numpy as np

from gcnbmp_tpu.chem import mol_from_smiles, GGNNFeaturizer, DrugFPFeaturizer
from gcnbmp_tpu.chem.featurize import DRUGFP_NUM_FEATURES
from gcnbmp_tpu.data.dataset import (
    PairDataset,
    bucket_size,
    make_batch,
    pad_graphs,
)


def _graph(smi, **kw):
    return GGNNFeaturizer(**kw)(mol_from_smiles(smi))


def test_atomic_number_ids():
    g = _graph("CCO")
    assert g.atom_ids.tolist() == [6, 6, 8]


def test_dense_adj_channels():
    g = _graph("C=C")  # one double bond
    adj = g.dense_adj()
    assert adj.shape == (4, 2, 2)
    assert adj[1, 0, 1] == 1.0 and adj[1, 1, 0] == 1.0
    assert adj[0].sum() == 0 and adj[2].sum() == 0 and adj[3].sum() == 0


def test_dense_adj_symmetric():
    g = _graph("CC(=O)Oc1ccccc1C(=O)O")
    adj = g.dense_adj()
    for e in range(4):
        assert np.array_equal(adj[e], adj[e].T)
    # total directed edges == 2 * bonds
    assert adj.sum() == 2 * 13


def test_wl_mode_vocab_growth():
    f = GGNNFeaturizer(mode="wl", radius=0)
    g1 = f(mol_from_smiles("CCO"))
    # C -> 0, O -> 1 in order of first appearance
    assert g1.atom_ids.tolist() == [0, 0, 1]
    g2 = f(mol_from_smiles("c1ccccc1"))  # aromatic C is a new ID
    assert g2.atom_ids.tolist() == [2] * 6


def test_wl_radius1_distinguishes_neighborhoods():
    f = GGNNFeaturizer(mode="wl", radius=1)
    g = f(mol_from_smiles("CCO"))
    # terminal C, middle C, and O all have distinct radius-1 environments
    assert len(set(g.atom_ids.tolist())) == 3


def test_drugfp_features():
    f = DrugFPFeaturizer()
    g = f(mol_from_smiles("CCO"))
    assert g.atom_feats.shape == (3, DRUGFP_NUM_FEATURES)
    # first atom: C symbol one-hot at position 0, degree 1
    assert g.atom_feats[0, 0] == 1.0
    assert g.atom_feats[0].sum() >= 4  # symbol + degree + numH + valence


def test_bucket_size():
    assert bucket_size(3) == 8
    assert bucket_size(8) == 8
    assert bucket_size(9) == 16
    assert bucket_size(100) == 128
    assert bucket_size(300) == 384


def test_pad_graphs_and_batch():
    ds = PairDataset()
    for s1, s2, y in [("CCO", "c1ccccc1", 1), ("CC", "C=O", 0)]:
        ds.append(_graph(s1), _graph(s2), np.float32(y))
    batch = make_batch(ds, [0, 1])
    assert batch.atoms1.shape == (2, 8)
    assert batch.adj1.shape == (2, 4, 8, 8)
    assert batch.mask1[0].sum() == 3 and batch.mask1[1].sum() == 2
    assert batch.mask2[0].sum() == 6 and batch.mask2[1].sum() == 2
    assert batch.labels.tolist() == [1.0, 0.0]
    # padded rows of adj are zero
    assert batch.adj1[:, :, 3:, :].sum() == 0


def test_augment_swap_and_rebalance(rng):
    ds = PairDataset()
    for i, (s1, s2, y) in enumerate(
        [("CCO", "CC", 1), ("C", "CO", 0), ("CN", "CCC", 0), ("C=O", "CC", 0)]
    ):
        ds.append(_graph(s1), _graph(s2), np.float32(y))
    aug = ds.augment_swap()
    assert len(aug) == 8
    assert aug.smiles_pairs[4] == ("CC", "CCO")
    bal = ds.rebalance(rng)
    labels = [float(l) for l in bal.labels]
    assert sum(labels) == 1 and len(labels) == 2


def test_featurizer_kekulize_and_add_hs():
    from gcnbmp_tpu.chem.mol import BondOrder
    from gcnbmp_tpu.chem.transforms import add_explicit_hydrogens, kekulize

    mol = mol_from_smiles("c1ccccc1")
    kek = kekulize(mol)
    orders = [b.order for b in kek.bonds]
    assert orders.count(BondOrder.DOUBLE) == 3
    assert orders.count(BondOrder.SINGLE) == 3
    assert not any(a.aromatic for a in kek.atoms)

    g = GGNNFeaturizer(kekulize=True)(mol_from_smiles("c1ccccc1"))
    assert (g.edge_type == 3).sum() == 0  # no aromatic channel
    assert (g.edge_type == 1).sum() == 6  # 3 double bonds, both directions

    g2 = GGNNFeaturizer(add_hs=True)(mol_from_smiles("CCO"))
    assert g2.num_atoms == 9  # 3 heavy + 6 H
    assert (g2.atom_ids == 1).sum() == 6

    mh = add_explicit_hydrogens(mol_from_smiles("c1cc[nH]c1"))
    assert sum(1 for a in mh.atoms if a.symbol == "H") == 5  # 4 CH + 1 NH


def test_kekulize_fused_and_heteroaromatic():
    from gcnbmp_tpu.chem.mol import BondOrder
    from gcnbmp_tpu.chem.transforms import kekulize

    for smi, n_doubles in [("c1ccc2ccccc2c1", 5), ("c1cc[nH]c1", 2),
                           ("c1ccoc1", 2), ("Cn1cnc2c1c(=O)n(C)c(=O)n2C", 4)]:
        k = kekulize(mol_from_smiles(smi))
        assert k is not None, smi
        assert not any(b.order == BondOrder.AROMATIC for b in k.bonds), smi
        assert sum(b.order == BondOrder.DOUBLE for b in k.bonds) \
            == n_doubles, smi
