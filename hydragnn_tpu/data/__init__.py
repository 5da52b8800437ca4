from hydragnn_tpu.data.neighbors import radius_graph, radius_graph_pbc
from hydragnn_tpu.data.dataloader import (
    GraphLoader,
    split_dataset,
    create_dataloaders,
)
