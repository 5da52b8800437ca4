from hydragnn_tpu.descriptors.atomicdescriptors import AtomicDescriptors
from hydragnn_tpu.descriptors.xyz2graph import (
    bond_orders_from_connectivity,
    connectivity_from_positions,
    xyz2graph,
)
