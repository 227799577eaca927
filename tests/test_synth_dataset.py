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


def test_kaist_mode_outputs(tmp_path):
    """37-type KAIST-scale mode (reference train_ggnn_hole_multi_class_x37
    label space; setting.py:33 NUM_DRUGS_KAIST)."""
    gen.main(["--out", str(tmp_path), "--kaist", "--n-drugs", "150",
              "--max-pairs", "2000", "--seed", "5"])
    labels = pd.read_csv(tmp_path / "labels.csv")["label"].tolist()
    assert len(labels) == 37 and len(set(labels)) == 37
    pairs = pd.read_csv(tmp_path / "pairs_multilabel.csv")
    assert list(pairs.columns) == [
        "cid_1", "cid_2", "drugbank_id_1", "drugbank_id_2",
        "smiles_1", "smiles_2", "label",
    ]
    assert len(pairs) == 2000
    used = set()
    for lab in pairs["label"]:
        ts = lab.split("||")
        assert ts and all(t in labels for t in ts)
        used.update(ts)
    # broad type coverage even at toy scale
    assert len(used) >= 30
    stats = json.load(open(tmp_path / "rule_stats.json"))
    assert stats["n_types"] == 37
    # every drug parses through the featurizer
    dl = pd.read_csv(tmp_path / "drug_list.csv")
    assert len(dl) == 150
    f = GGNNFeaturizer()
    for s in dl["smiles"][:10]:
        assert f(mol_from_smiles(s)).atom_ids.shape[0] >= 5


def test_kaist_rules_structural():
    drugs = gen.enumerate_drugs_kaist(150, seed=2)
    rules = dict(gen._kaist_type_rules())
    acid = next(d for d in drugs if "acid_c" in d["classes"])
    base = next(d for d in drugs if "base_p" in d["classes"])
    assert rules["carboxyl_primary_amine"](acid, base)
    assert rules["carboxyl_primary_amine"](base, acid)  # symmetric
    plain = next(
        d for d in drugs
        if not d["classes"] and d["n_aromatic"] < 7 and d["n_N"] == 0
        and d["n_O"] == 0
    )
    assert not any(fn(plain, plain) for fn in rules.values())
