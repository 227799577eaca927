"""Chemistry layer: SMILES parsing and molecular-graph featurization.

Replaces the reference's RDKit + chainer-chemistry preprocessing stack
(reference: my_utils/preprocessors/ggnn_preprocessor.py,
graph_features.py) with a dependency-free implementation.  If RDKit is
importable it is used as the parsing backend; otherwise the built-in
OpenSMILES-subset parser in ``smiles.py`` is used.
"""

from gcnbmp_tpu.chem.mol import Atom, Bond, Mol, BondOrder
from gcnbmp_tpu.chem.smiles import mol_from_smiles, SmilesError
from gcnbmp_tpu.chem.featurize import (
    GGNNFeaturizer,
    DrugFPFeaturizer,
    MolGraph,
)
from gcnbmp_tpu.chem.mol2vec import (
    Mol2VecFeaturizer,
    identifier_table_from_corpus,
    mol2vec_table,
    morgan_sentence,
)

__all__ = [
    "Mol2VecFeaturizer",
    "identifier_table_from_corpus",
    "mol2vec_table",
    "morgan_sentence",
    "Atom",
    "Bond",
    "Mol",
    "BondOrder",
    "mol_from_smiles",
    "SmilesError",
    "GGNNFeaturizer",
    "DrugFPFeaturizer",
    "MolGraph",
]
