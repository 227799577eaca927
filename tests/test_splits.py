"""Dataset generation / splitting tests."""

import numpy as np
import pandas as pd
import pytest

from gcnbmp_tpu.data.splits import (
    dedupe_symmetric,
    generate_pairs_from_matrix,
    interaction_scale_series,
    kaist_multilabel_split,
    murcko_scaffold_key,
    random_split_by_drug,
    scaffold_split_by_drug,
    split_statistics,
    stratified_interaction_split,
    validate_drug_list,
    write_pair_csv,
)

SMILES = {
    "D0": "CCO", "D1": "c1ccccc1", "D2": "Cc1ccccc1", "D3": "CCCCO",
    "D4": "c1ccncc1", "D5": "CC(=O)O", "D6": "OCCO", "D7": "CCc1ccccc1",
    "D8": "C1CCCCC1", "D9": "CC(C)O",
}


def _matrix(n=10, seed=0):
    rng = np.random.default_rng(seed)
    m = rng.integers(0, 2, size=(n, n))
    m = np.triu(m, 1)
    return m + m.T


def test_generate_pairs_upper_triangle():
    ids = list(SMILES)
    m = _matrix()
    pairs, labels = generate_pairs_from_matrix(m, ids)
    assert len(pairs) == 10 * 9 // 2
    # label matches the matrix
    idx = {d: i for i, d in enumerate(ids)}
    for (a, b), y in zip(pairs, labels):
        assert y == (m[idx[a], idx[b]] > 0)


def test_random_split_by_drug_no_leakage():
    ids = list(SMILES)
    pairs, labels = generate_pairs_from_matrix(_matrix(), ids)
    splits = random_split_by_drug(pairs, labels, ids, seed=7)
    train_drugs = {d for p, _ in [splits["train"]] for a, b in p for d in (a, b)}
    for key in ("valid", "test"):
        for a, b in splits[key][0]:
            # exactly one endpoint is a train drug (splits.py pairs one
            # train drug with one held-out drug)
            assert (a in train_drugs) != (b in train_drugs)
    # valid and test drugs don't overlap
    vd = {d for a, b in splits["valid"][0] for d in (a, b)} - train_drugs
    td = {d for a, b in splits["test"][0] for d in (a, b)} - train_drugs
    assert not (vd & td)


def test_scaffold_split_groups_same_scaffold():
    # benzene-scaffold drugs (D1, D2, D7) must land in the same fold
    ids = list(SMILES)
    pairs, labels = generate_pairs_from_matrix(_matrix(), ids)
    splits = scaffold_split_by_drug(
        pairs, labels, ids, SMILES, frac_train=0.5, frac_valid=0.3, frac_test=0.2
    )
    # a drug's NON-train fold memberships identify its partition (valid/
    # test pairs have exactly one held-out endpoint); same-scaffold drugs
    # must share one partition
    train_drugs = {d for a, b in splits["train"][0] for d in (a, b)}
    held = {}
    for key in ("valid", "test"):
        for a, b in splits[key][0]:
            for d in (a, b):
                if d not in train_drugs:
                    held.setdefault(d, set()).add(key)
    benzene = [d for d in ids
               if murcko_scaffold_key(SMILES[d])
               == murcko_scaffold_key("c1ccccc1")]
    assert len(benzene) >= 2
    memberships = {
        ("train",) if d in train_drugs else tuple(sorted(held.get(d, ())))
        for d in benzene
    }
    assert len(memberships) == 1, memberships  # all in one fold
    assert murcko_scaffold_key("c1ccccc1") == murcko_scaffold_key("Cc1ccccc1")
    assert murcko_scaffold_key("c1ccccc1") != murcko_scaffold_key("c1ccncc1")
    assert murcko_scaffold_key("CCO") == ""  # acyclic


def test_stratified_interaction_split_preserves_ratio():
    ids = [f"D{i}" for i in range(40)]
    m = _matrix(40, seed=3)
    pairs, labels = generate_pairs_from_matrix(m, ids)
    splits = stratified_interaction_split(pairs, labels)
    total = sum(len(l) for _, l in splits.values())
    assert total == len(labels)
    base = labels.mean()
    for key, (_, l) in splits.items():
        assert abs(l.mean() - base) < 0.05, key


def test_interaction_scale_series_balanced():
    rng = np.random.default_rng(0)
    n = 2000
    pairs = np.asarray([(f"a{i}", f"b{i}") for i in range(n)], dtype=object)
    labels = rng.integers(0, 2, size=n)
    series = interaction_scale_series(pairs, labels, sizes=(100, 400))
    for size, (p, l) in series.items():
        assert len(p) == size
        assert l.sum() == size // 2


def test_dedupe_symmetric():
    pairs = [("a", "b"), ("b", "a"), ("a", "c"), ("c", "a"), ("a", "b")]
    assert dedupe_symmetric(pairs) == [0, 2]


def test_kaist_multilabel_split():
    rows = []
    for i in range(60):
        rows.append({
            "drugbank_id_1": f"A{i}", "drugbank_id_2": f"B{i}",
            "smiles_1": "CCO", "smiles_2": "CC",
            "label": ("type1||type2" if i % 2 else "type3"),
        })
    # add a symmetric duplicate
    rows.append({"drugbank_id_1": "B0", "drugbank_id_2": "A0",
                 "smiles_1": "CC", "smiles_2": "CCO", "label": "type3"})
    df = pd.DataFrame(rows)
    splits = kaist_multilabel_split(df)
    total = sum(len(d) for d in splits.values())
    assert total == 60  # duplicate removed
    assert len(splits["train"]) > len(splits["valid"])


def test_write_pair_csv_schema(tmp_path):
    ids = list(SMILES)
    info = pd.DataFrame({
        "cid": ids,
        "drugbank_id": [f"DB{i}" for i in range(len(ids))],
        "smiles": [SMILES[d] for d in ids],
    })
    pairs, labels = generate_pairs_from_matrix(_matrix(), ids)
    path = str(tmp_path / "out.csv")
    df = write_pair_csv(path, pairs[:5], labels[:5], info)
    loaded = pd.read_csv(path)
    assert list(loaded.columns) == [
        "cid_1", "cid_2", "drugbank_id_1", "drugbank_id_2",
        "smiles_1", "smiles_2", "label",
    ]
    assert len(loaded) == 5
    stats = split_statistics(labels)
    assert stats["total"] == len(labels)


def test_validate_drug_list():
    df = pd.DataFrame({"smiles": ["CCO", "not_a_smiles", "c1ccccc1"]})
    assert validate_drug_list(df) == [1]


def test_export_known_ddis_edgelist(tmp_path):
    from gcnbmp_tpu.data.splits import export_known_ddis_edgelist

    mat = _matrix()
    ids = list(SMILES)
    df = pd.DataFrame(mat, columns=ids)
    path = str(tmp_path / "ddi.edgelist")
    pairs = export_known_ddis_edgelist(df, path)
    # one line per upper-triangle interaction, "cid_i cid_j"
    lines = open(path).read().splitlines()
    assert len(lines) == int(mat.sum() // 2) == len(pairs)
    i, j = ids.index(lines[0].split()[0]), ids.index(lines[0].split()[1])
    assert i < j and mat[i, j] == 1


def test_data_generator_cli_kaist_and_edgelist(tmp_path):
    import data_generator

    # kaist mode: multi-label pair CSV in, 3 CSVs out
    rows = [{"drugbank_id_1": f"A{i}", "drugbank_id_2": f"B{i}",
             "smiles_1": "CCO", "smiles_2": "CC",
             "label": ("t1||t2" if i % 2 else "t3")} for i in range(40)]
    src = tmp_path / "pairs.csv"
    pd.DataFrame(rows).to_csv(src, index=False)
    out = tmp_path / "kaist"
    assert data_generator.main(
        ["--split", "kaist", "--kaist-csv", str(src), "--out", str(out)]
    ) == 0
    parts = [pd.read_csv(out / f"ddi_{k}_multi.csv")
             for k in ("train", "valid", "test")]
    assert sum(len(p) for p in parts) == 40

    # edgelist flag alongside a normal split
    ids = list(SMILES)
    drug_csv = tmp_path / "drugs.csv"
    pd.DataFrame({
        "cid": ids, "drugbank_id": [f"DB{i}" for i in range(len(ids))],
        "smiles": [SMILES[d] for d in ids],
    }).to_csv(drug_csv, index=False)
    mat_csv = tmp_path / "matrix.csv"
    pd.DataFrame(_matrix(), columns=ids).to_csv(mat_csv, index=False)
    edge = tmp_path / "known.edgelist"
    out2 = tmp_path / "inter"
    assert data_generator.main(
        ["--drug-list", str(drug_csv), "--matrix", str(mat_csv),
         "--split", "inter", "--out", str(out2), "--edgelist", str(edge)]
    ) == 0
    assert edge.exists() and len(open(edge).read().splitlines()) > 0
