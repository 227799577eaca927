"""SMILES parser unit tests."""

import numpy as np
import pytest

from gcnbmp_tpu.chem import mol_from_smiles, GGNNFeaturizer, SmilesError
from gcnbmp_tpu.chem.mol import BondOrder
from gcnbmp_tpu.chem.smiles import _parse_smiles_graph


@pytest.mark.parametrize(
    "smi,n_atoms,n_bonds",
    [
        ("C", 1, 0),
        ("CCO", 3, 2),
        ("C=C", 2, 1),
        ("C#N", 2, 1),
        ("c1ccccc1", 6, 6),
        ("C1=CC=CC=C1", 6, 6),
        ("CC(=O)Oc1ccccc1C(=O)O", 13, 13),  # aspirin
        ("[Na+].[Cl-]", 2, 0),
        ("C[C@H](N)C(=O)O", 6, 5),
        ("c1ccc2ccccc2c1", 10, 11),  # naphthalene
        ("C%10CC%10", 3, 3),
        ("O=C(O)c1ccccc1", 9, 9),
        ("[13CH4]", 1, 0),
        ("[O-]S(=O)(=O)[O-]", 5, 4),
        ("N[C@@H](Cc1c[nH]c2ccccc12)C(=O)O", 15, 16),  # tryptophan
    ],
)
def test_parse_counts(smi, n_atoms, n_bonds):
    mol = mol_from_smiles(smi)
    assert mol is not None
    assert mol.num_atoms == n_atoms
    assert mol.num_bonds == n_bonds


def test_parse_failure_returns_none():
    assert mol_from_smiles("not a smiles") is None
    assert mol_from_smiles("C1CC") is None  # unclosed ring
    assert mol_from_smiles("C(C") is None  # unclosed branch
    with pytest.raises(SmilesError):
        mol_from_smiles("C1CC", strict=True)


def test_implicit_hydrogens():
    mol = mol_from_smiles("CCO")
    assert [a.total_h for a in mol.atoms] == [3, 2, 1]
    mol = mol_from_smiles("c1ccccc1")  # benzene: 1 H each
    assert [a.total_h for a in mol.atoms] == [1] * 6
    mol = mol_from_smiles("C=O")
    assert [a.total_h for a in mol.atoms] == [2, 0]
    mol = mol_from_smiles("[NH4+]")
    assert mol.atoms[0].total_h == 4 and mol.atoms[0].charge == 1


def test_charges():
    mol = mol_from_smiles("[O-]C(=O)C")
    assert mol.atoms[0].charge == -1
    mol = mol_from_smiles("[Fe+2]")
    assert mol.atoms[0].charge == 2
    mol = mol_from_smiles("[Fe++]")
    assert mol.atoms[0].charge == 2


def test_kekulized_equals_aromatic():
    """Kekulized and aromatic spellings must featurize identically
    (the reference gets this from RDKit sanitization)."""
    f = GGNNFeaturizer()
    for arom, kek in [
        ("c1ccccc1", "C1=CC=CC=C1"),
        ("c1ccncc1", "C1=CC=NC=C1"),
        ("c1cc[nH]c1", "N1C=CC=C1"),
        ("c1ccsc1", "S1C=CC=C1"),
        ("c1ccoc1", "O1C=CC=C1"),
    ]:
        ga, gk = f(mol_from_smiles(arom)), f(mol_from_smiles(kek))
        assert np.array_equal(
            np.sort(ga.atom_ids), np.sort(gk.atom_ids)
        ), arom
        assert np.array_equal(
            np.bincount(ga.edge_type, minlength=4),
            np.bincount(gk.edge_type, minlength=4),
        ), arom


def test_quinone_not_aromatic():
    mol = mol_from_smiles("O=C1C=CC(=O)C=C1")
    assert not any(a.aromatic for a in mol.atoms)


def test_cyclohexane_not_aromatic():
    mol = mol_from_smiles("C1CCCCC1")
    assert not any(a.aromatic for a in mol.atoms)
    assert all(b.order == BondOrder.SINGLE for b in mol.bonds)


def test_malformed_percent_ring_closures_fail_cleanly():
    """Regression: unterminated '%(' must not loop forever; non-numeric
    ring ids must return None, not raise/abort."""
    for bad in ("C%(12", "C%(x)O", "C%(999999999999)O", "C%"):
        assert mol_from_smiles(bad) is None, bad


def test_fused_aromatic_spellings_agree():
    """Regression: every kekulized spelling of naphthalene perceives the
    same 10 aromatic atoms / 11 aromatic bonds (the DFS cycle basis can
    yield the 10-ring rim; the XOR augmentation recovers the second
    6-ring)."""
    from gcnbmp_tpu.chem.mol import BondOrder

    for smi in ("C1=CC=C2C(=C1)C=CC=C2", "C1=CC=C2C=CC=CC2=C1",
                "c1ccc2ccccc2c1"):
        m = mol_from_smiles(smi)
        assert sum(a.aromatic for a in m.atoms) == 10, smi
        assert sum(b.order == BondOrder.AROMATIC for b in m.bonds) == 11, smi
    # anthracene: three fused rings
    m = mol_from_smiles("C1=CC=C2C=C3C=CC=CC3=CC2=C1")
    assert sum(a.aromatic for a in m.atoms) == 14


def test_colon_bond_aromatic_atoms():
    """Regression: ':'-spelled aromatic rings flag the ATOMS aromatic,
    not just the bonds."""
    m = mol_from_smiles("C:1:C:C:C:C:C:1")
    assert sum(a.aromatic for a in m.atoms) == 6


def test_bond_symbols():
    mol = _parse_smiles_graph("C-C=C#C:C/C\\C")
    orders = [b.order for b in mol.bonds]
    assert orders[:4] == [
        BondOrder.SINGLE,
        BondOrder.DOUBLE,
        BondOrder.TRIPLE,
        BondOrder.AROMATIC,
    ]
    assert orders[4:] == [BondOrder.SINGLE, BondOrder.SINGLE]


def test_ring_bond_order_on_closure():
    mol = mol_from_smiles("C=1CCCCC=1")  # double bond via ring closure
    ring_bond = [b for b in mol.bonds if {b.a1, b.a2} == {0, 5}][0]
    assert ring_bond.order == BondOrder.DOUBLE
