"""Native C++ parser: exact agreement with the Python reference parser."""

import numpy as np
import pytest

from gcnbmp_tpu.chem import GGNNFeaturizer, mol_from_smiles
from gcnbmp_tpu.chem.native import native_available, parse_smiles_batch_native

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native library not built"
)

CORPUS = [
    "C", "CCO", "C=C", "C#N", "c1ccccc1", "C1=CC=CC=C1",
    "CC(=O)Oc1ccccc1C(=O)O", "O=C(O)C1=CC=CC=C1OC(C)=O",
    "[Na+].[Cl-]", "C[C@H](N)C(=O)O", "c1ccc2ccccc2c1",
    "C1=CC2=CC=CC=C2C=C1", "c1cc[nH]c1", "N1C=CC=C1",
    "O=C1C=CC(=O)C=C1", "C%10CC%10", "CC(C)(C)c1ccc(O)cc1",
    "Cn1cnc2c1c(=O)n(C)c(=O)n2C", "CC(C)Cc1ccc(cc1)C(C)C(=O)O",
    "NS(=O)(=O)c1cc2c(cc1Cl)NC(NS2(=O)=O)C1CC1",
    "[13CH4]", "[O-]S(=O)(=O)[O-]", "[NH4+]", "[Fe+2]", "[Fe++]",
    "N[C@@H](Cc1c[nH]c2ccccc12)C(=O)O", "c1ccsc1", "S1C=CC=C1",
    "c1ccoc1", "O1C=CC=C1", "C=1CCCCC=1", "OCC(O)C(O)C(O)C(O)CO",
    "Oc1ccc(cc1)/C=C/c1cc(O)cc(O)c1", "CN1CCC[C@H]1c1cccnc1",
    "not a smiles", "C1CC", "C(C",
]


def test_native_matches_python_exactly():
    f = GGNNFeaturizer()
    native = parse_smiles_batch_native(CORPUS)
    for smi, g_nat in zip(CORPUS, native):
        mol = mol_from_smiles(smi)
        if mol is None:
            assert g_nat is None, smi
            continue
        g_py = f(mol)
        assert g_nat is not None, smi
        np.testing.assert_array_equal(g_nat.atom_ids, g_py.atom_ids, err_msg=smi)
        # same bond multiset (order of directed edges may differ)
        def canon(g):
            return sorted(zip(g.edge_src.tolist(), g.edge_dst.tolist(),
                              g.edge_type.tolist()))
        assert canon(g_nat) == canon(g_py), smi


def test_native_edge_cases_no_abort():
    """Regression: malformed '%()' ring ids must mark the row failed
    (not std::terminate the process); bond-free / all-failed / empty
    batches must not crash on NULL vector data; fused kekulized
    aromatics must match Python."""
    out = parse_smiles_batch_native(["CCO", "C%(x)O", "C%(99999999999)O"])
    assert out[0] is not None and out[1] is None and out[2] is None
    ions = parse_smiles_batch_native(["[Na+]", "[Cl-]"])
    assert [g.num_atoms for g in ions] == [1, 1]
    assert [g.num_edges for g in ions] == [0, 0]
    assert parse_smiles_batch_native(["%%%", "((("]) == [None, None]
    assert parse_smiles_batch_native([]) == []
    f = GGNNFeaturizer()
    for smi in ("C1=CC=C2C(=C1)C=CC=C2", "C1=CC=C2C=C3C=CC=CC3=CC2=C1",
                "C:1:C:C:C:C:C:1"):
        g_py = f(mol_from_smiles(smi))
        g_nat = parse_smiles_batch_native([smi])[0]
        np.testing.assert_array_equal(g_nat.atom_ids, g_py.atom_ids,
                                      err_msg=smi)
        assert (sorted(g_nat.edge_type.tolist())
                == sorted(g_py.edge_type.tolist())), smi


def test_native_batch_threads():
    batch = CORPUS * 8
    single = parse_smiles_batch_native(batch, n_threads=1)
    multi = parse_smiles_batch_native(batch, n_threads=4)
    for a, b in zip(single, multi):
        assert (a is None) == (b is None)
        if a is not None:
            np.testing.assert_array_equal(a.atom_ids, b.atom_ids)


def test_native_faster_than_python():
    import time

    batch = [s for s in CORPUS if mol_from_smiles(s) is not None] * 40
    f = GGNNFeaturizer()
    t0 = time.perf_counter()
    for s in batch:
        f(mol_from_smiles(s))
    t_py = time.perf_counter() - t0
    parse_smiles_batch_native(batch[:4])  # warm the library
    t0 = time.perf_counter()
    parse_smiles_batch_native(batch, n_threads=4)
    t_nat = time.perf_counter() - t0
    # native measures ~35x faster; 2x margin absorbs scheduler noise
    assert t_nat * 2 < t_py, (t_nat, t_py)


def test_parser_fuzz_no_crashes():
    """Random mutations of valid SMILES: both parsers must agree on
    accept/reject and never crash."""
    import random

    from gcnbmp_tpu.chem import GGNNFeaturizer

    rng = random.Random(0)
    alphabet = "CNOSPcnos()[]=#123456@+-HFIl Br%"
    cases = []
    base = [s for s in CORPUS if mol_from_smiles(s) is not None]
    for _ in range(300):
        s = list(rng.choice(base))
        for _ in range(rng.randint(1, 3)):
            op = rng.random()
            pos = rng.randrange(len(s) + 1)
            if op < 0.4 and s:
                del s[min(pos, len(s) - 1)]
            elif op < 0.8:
                s.insert(pos, rng.choice(alphabet))
            elif s:
                s[min(pos, len(s) - 1)] = rng.choice(alphabet)
        cases.append("".join(s))
    f = GGNNFeaturizer()
    native = parse_smiles_batch_native(cases)
    for smi, g_nat in zip(cases, native):
        mol = mol_from_smiles(smi)  # must not raise
        if mol is None:
            assert g_nat is None, smi
        else:
            g_py = f(mol)
            assert g_nat is not None, smi
            np.testing.assert_array_equal(
                np.sort(g_nat.atom_ids), np.sort(g_py.atom_ids), err_msg=smi
            )
