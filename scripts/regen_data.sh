#!/bin/bash
set -euo pipefail
cd /root/repo
python examples/make_synth_drugbank.py --out dataset/synth546 --multi-label
python data_generator.py --drug-list dataset/synth546/drug_list.csv \
  --matrix dataset/synth546/drug_drug_matrix.csv \
  --split inter --out dataset/synth546/inter --validate
python - <<'PYEOF'
import pandas as pd
df = pd.read_csv("dataset/synth546/inter/ddi_inter_train.csv")
pos, neg = df[df.label==1], df[df.label==0]
sub = pd.concat([pos.sample(17500, random_state=1), neg.sample(17500, random_state=1)])
sub.sample(frac=1.0, random_state=2).to_csv(
    "dataset/synth546/inter/isc35000_train.csv", index=False)
for split in ("valid", "test"):
    d = pd.read_csv(f"dataset/synth546/inter/ddi_inter_{split}.csv")
    d.sample(4000, random_state=3).to_csv(
        f"dataset/synth546/inter/inter_{split}_4k.csv", index=False)
PYEOF
python data_generator.py --split kaist \
  --kaist-csv dataset/synth546/pairs_multilabel.csv --out dataset/synth546/kaist
python examples/make_synth_drugbank.py --out dataset/synth1704 --kaist
python data_generator.py --split kaist \
  --kaist-csv dataset/synth1704/pairs_multilabel.csv --out dataset/synth1704/kaist
python examples/make_synth_drugbank.py --out dataset/synth1704x86 --kaist --n-types 86
python data_generator.py --split kaist \
  --kaist-csv dataset/synth1704x86/pairs_multilabel.csv --out dataset/synth1704x86/kaist
echo REGEN_DONE
