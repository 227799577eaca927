"""Smoke test for the DrugBank-scale synthetic dataset generator."""

import json
import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

import make_synth_drugbank as gen  # noqa: E402

from gcnbmp_tpu.chem import GGNNFeaturizer, mol_from_smiles  # noqa: E402


def test_enumerate_drugs_valid_and_distinct():
    drugs = gen.enumerate_drugs(60, seed=0)
    smis = [d["smiles"] for d in drugs]
    assert len(set(smis)) == 60
    f = GGNNFeaturizer()
    for s in smis[:10]:
        g = f(mol_from_smiles(s))
        assert g.atom_ids.shape[0] >= 5


def test_generator_cli_outputs(tmp_path):
    gen.main(["--out", str(tmp_path), "--n-drugs", "40", "--noise", "0.05",
              "--seed", "3"])
    dl = pd.read_csv(tmp_path / "drug_list.csv")
    assert list(dl.columns) == ["cid", "drugbank_id", "smiles"]
    assert len(dl) == 40
    mat = pd.read_csv(tmp_path / "drug_drug_matrix.csv")
    m = mat.to_numpy()
    assert m.shape == (40, 40)
    assert np.array_equal(m, m.T) and set(np.unique(m)) <= {0, 1}
    stats = json.load(open(tmp_path / "rule_stats.json"))
    assert 0.0 < stats["pos_rate"] < 1.0


def test_interaction_rule_is_structural():
    drugs = gen.enumerate_drugs(120, seed=1)
    acid = next(d for d in drugs if "acid" in d["classes"])
    base = next(d for d in drugs if "base" in d["classes"])
    plain = next(
        d for d in drugs
        if not d["classes"] and d["n_aromatic"] < 7 and d["n_N"] == 0
    )
    assert gen.interaction_label(acid, base) == 1
    assert gen.interaction_label(plain, plain) == 0
