#!/usr/bin/env python
"""Dataset generation CLI — the reference data_generator.py re-expressed
over gcnbmp_tpu.data.splits.

Reads a drug list CSV (cid, drugbank_id, smiles) and a drug-drug matrix
CSV, writes train/valid/test pair CSVs under --out.

Examples:
    python data_generator.py --drug-list drug_list.csv \
        --matrix drug_drug_matrix.csv --split inter --out dataset/inter
    python data_generator.py ... --split drug            # drug-based random
    python data_generator.py ... --split scaffold        # scaffold split
    python data_generator.py ... --split isc --sizes 10000,35000
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np
import pandas as pd


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--drug-list", required=True)
    p.add_argument("--matrix", required=True)
    p.add_argument("--split", default="inter",
                   choices=["inter", "drug", "scaffold", "isc"])
    p.add_argument("--out", required=True)
    p.add_argument("--frac-train", type=float, default=0.8)
    p.add_argument("--frac-valid", type=float, default=0.1)
    p.add_argument("--sizes", default="10000,20000,30000,35000,40000,50000,60000,70000")
    p.add_argument("--seed", type=int, default=2018)
    p.add_argument("--validate", action="store_true",
                   help="check all drug SMILES parse before splitting")
    args = p.parse_args(argv)

    from gcnbmp_tpu.data import splits as S

    drug_df = pd.read_csv(args.drug_list)
    matrix_df = pd.read_csv(args.matrix)
    mat = matrix_df.select_dtypes(include=[np.number]).to_numpy()
    ids = list(drug_df["cid"])
    if args.validate:
        bad = S.validate_drug_list(drug_df)
        if bad:
            print(f"ERROR: unparseable SMILES at rows {bad}", file=sys.stderr)
            return 1
    pairs, labels = S.generate_pairs_from_matrix(mat, ids)
    os.makedirs(args.out, exist_ok=True)
    frac_test = 1.0 - args.frac_train - args.frac_valid

    stats = {}
    if args.split == "isc":
        sizes = tuple(int(x) for x in args.sizes.split(","))
        series = S.interaction_scale_series(pairs, labels, sizes, seed=args.seed)
        for size, (p_, l_) in series.items():
            path = os.path.join(args.out, f"isc{size}.csv")
            S.write_pair_csv(path, p_, l_, drug_df)
            stats[f"isc{size}"] = S.split_statistics(l_)
    else:
        if args.split == "inter":
            result = S.stratified_interaction_split(
                pairs, labels, args.frac_train, args.frac_valid, frac_test,
                seed=args.seed,
            )
        elif args.split == "drug":
            result = S.random_split_by_drug(
                pairs, labels, ids, args.frac_train, args.frac_valid, frac_test,
                seed=args.seed,
            )
        else:  # scaffold
            smiles_by_id = dict(zip(drug_df["cid"], drug_df["smiles"]))
            result = S.scaffold_split_by_drug(
                pairs, labels, ids, smiles_by_id,
                args.frac_train, args.frac_valid, frac_test,
            )
        for key, (p_, l_) in result.items():
            path = os.path.join(args.out, f"ddi_{args.split}_{key}.csv")
            S.write_pair_csv(path, p_, l_, drug_df)
            stats[key] = S.split_statistics(l_)
    print(json.dumps(stats, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
