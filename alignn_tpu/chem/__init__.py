"""Chemistry & structure layer (L0): atoms, lattices, element features."""

from alignn_tpu.chem.atoms import Atoms, Lattice, atomic_masses
from alignn_tpu.chem.features import (
    FEATURESET_SIZE,
    attribute_lookup_table,
    get_node_attributes,
)
from alignn_tpu.chem.periodic_table import MAX_Z, SYMBOLS, Z_FROM_SYMBOL

__all__ = [
    "Atoms", "Lattice", "atomic_masses", "FEATURESET_SIZE",
    "attribute_lookup_table", "get_node_attributes", "MAX_Z", "SYMBOLS",
    "Z_FROM_SYMBOL",
]
