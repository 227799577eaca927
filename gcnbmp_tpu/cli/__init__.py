"""Console entry points (installed as gcnbmp-train/eval/predict/data).

Each module keeps the reference CLI's surface (SURVEY.md §2.6-§2.7:
train_ddi_modify_eval2.py / eval_coattention.py / mol2vec_predict.py /
data_generator.py) behind one typed-config command per role; repo-root
shims (train.py, eval.py, predict.py, data_generator.py) preserve the
`python train.py ...` workflow without an install."""
