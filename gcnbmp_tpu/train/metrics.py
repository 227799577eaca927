"""Evaluation metrics: accuracy / ROC-AUC / PRC-AUC / F1 / precision / recall.

Logits are collected on device over the full evaluation set and metrics
finalized host-side — matching the reference's BatchEvaluator design
(training/extensions/batch_evaluator.py:29-101: sigmoid over all logits,
then sklearn metric).  Multi-label variants average the metric per class
column, skipping degenerate columns instead of raising — the
``raise_value_error=False`` behavior of the reference's multilabel
evaluators (training/multilabel_extensions/roc_auc_evaluator.py:119-128).
"""

from __future__ import annotations

from typing import Dict

import numpy as np
from sklearn import metrics as skm


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


def binary_metrics(
    logits: np.ndarray, labels: np.ndarray, threshold: float = 0.5
) -> Dict[str, float]:
    """Metrics for binary DDI (labels in {0,1}, logits pre-sigmoid)."""
    logits = np.ravel(np.asarray(logits, dtype=np.float64))
    labels = np.ravel(np.asarray(labels)).astype(np.int64)
    probs = _sigmoid(logits)
    preds = (probs >= threshold).astype(np.int64)
    out: Dict[str, float] = {
        "accuracy": float((preds == labels).mean()) if labels.size else float("nan"),
    }
    if labels.size and 0 < labels.sum() < labels.size:
        out["roc_auc"] = float(skm.roc_auc_score(labels, probs))
        precision, recall, _ = skm.precision_recall_curve(labels, probs)
        out["prc_auc"] = float(skm.auc(recall, precision))
    else:
        out["roc_auc"] = float("nan")
        out["prc_auc"] = float("nan")
    out["f1"] = float(skm.f1_score(labels, preds, zero_division=0))
    out["precision"] = float(skm.precision_score(labels, preds, zero_division=0))
    out["recall"] = float(skm.recall_score(labels, preds, zero_division=0))
    return out


def multilabel_metrics(
    logits: np.ndarray, labels: np.ndarray, threshold: float = 0.5,
    class_names=None,
) -> Dict[str, float]:
    """Per-class-mean metrics for multi-hot labels (B, C).

    With ``class_names`` (length C), also returns a ``"per_class"`` dict
    mapping each name to its own roc_auc/prc_auc/f1/support — the
    per-column breakdown behind the reference evaluators' class means
    (training/multilabel_extensions/roc_auc_evaluator.py:119-128).
    """
    logits = np.asarray(logits, dtype=np.float64)
    labels = np.asarray(labels).astype(np.int64)
    probs = _sigmoid(logits)
    preds = (probs >= threshold).astype(np.int64)
    rocs, prcs, f1s, accs, precs, recs = [], [], [], [], [], []
    per_class: Dict[str, Dict[str, float]] = {}
    for c in range(labels.shape[1]):
        y = labels[:, c]
        acc = float((preds[:, c] == y).mean())
        f1 = float(skm.f1_score(y, preds[:, c], zero_division=0))
        accs.append(acc)
        f1s.append(f1)
        precs.append(float(skm.precision_score(y, preds[:, c], zero_division=0)))
        recs.append(float(skm.recall_score(y, preds[:, c], zero_division=0)))
        roc = prc = float("nan")
        if 0 < y.sum() < y.size:
            roc = float(skm.roc_auc_score(y, probs[:, c]))
            p, r, _ = skm.precision_recall_curve(y, probs[:, c])
            prc = float(skm.auc(r, p))
            rocs.append(roc)
            prcs.append(prc)
        if class_names is not None:
            per_class[str(class_names[c])] = {
                "roc_auc": roc, "prc_auc": prc, "f1": f1,
                "support": int(y.sum()),
            }
    out: Dict[str, float] = {
        "accuracy": float(np.mean(accs)) if accs else float("nan"),
        "roc_auc": float(np.mean(rocs)) if rocs else float("nan"),
        "prc_auc": float(np.mean(prcs)) if prcs else float("nan"),
        "f1": float(np.mean(f1s)) if f1s else float("nan"),
        "precision": float(np.mean(precs)) if precs else float("nan"),
        "recall": float(np.mean(recs)) if recs else float("nan"),
    }
    if class_names is not None:
        out["per_class"] = per_class
    return out


def compute_metrics(
    logits: np.ndarray, labels: np.ndarray, class_num: int = 1,
    class_names=None,
) -> Dict[str, float]:
    if class_num > 1:
        return multilabel_metrics(logits, labels, class_names=class_names)
    return binary_metrics(logits, labels)
