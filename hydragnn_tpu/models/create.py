"""Model factory (ref: hydragnn/models/create.py:35-519).

Maps ``mpnn_type`` -> stack class. The reference threads ``input_args``/
``conv_args`` signature strings through PyG Sequential; here each stack's conv
modules consume a uniform ``(inv, equiv, batch, ctx)`` signature, so no string
plumbing is needed.
"""

from __future__ import annotations

from typing import Any, Dict

from hydragnn_tpu.models.arch import ArchConfig, arch_config_from_dict
from hydragnn_tpu.models.base import HydraBase


def _registry():
    from hydragnn_tpu.models.gin import GINStack
    from hydragnn_tpu.models.sage import SAGEStack
    from hydragnn_tpu.models.mfc import MFCStack
    from hydragnn_tpu.models.cgcnn import CGCNNStack
    from hydragnn_tpu.models.pna import PNAStack

    reg = {
        "GIN": GINStack,
        "SAGE": SAGEStack,
        "MFC": MFCStack,
        "CGCNN": CGCNNStack,
        "PNA": PNAStack,
    }
    try:
        from hydragnn_tpu.models.gat import GATStack

        reg["GAT"] = GATStack
    except ImportError:
        pass
    try:
        from hydragnn_tpu.models.schnet import SCFStack

        reg["SchNet"] = SCFStack
    except ImportError:
        pass
    try:
        from hydragnn_tpu.models.egnn import EGCLStack

        reg["EGNN"] = EGCLStack
    except ImportError:
        pass
    try:
        from hydragnn_tpu.models.pnaplus import PNAPlusStack

        reg["PNAPlus"] = PNAPlusStack
    except ImportError:
        pass
    try:
        from hydragnn_tpu.models.painn import PAINNStack

        reg["PAINN"] = PAINNStack
    except ImportError:
        pass
    try:
        from hydragnn_tpu.models.pnaeq import PNAEqStack

        reg["PNAEq"] = PNAEqStack
    except ImportError:
        pass
    try:
        from hydragnn_tpu.models.dimenet import DIMEStack

        reg["DimeNet"] = DIMEStack
    except ImportError:
        pass
    try:
        from hydragnn_tpu.models.mace import MACEStack

        reg["MACE"] = MACEStack
    except ImportError:
        pass
    return reg


def create_model(cfg: ArchConfig) -> HydraBase:
    reg = _registry()
    if cfg.mpnn_type not in reg:
        raise ValueError(f"Unknown mpnn_type: {cfg.mpnn_type}")
    # model-specific required-argument checks (ref: create.py:160-478)
    if cfg.mpnn_type in ("PNA", "PNAPlus", "PNAEq"):
        assert cfg.pna_deg is not None, f"{cfg.mpnn_type} requires degree input."
    if cfg.mpnn_type == "MFC":
        assert cfg.max_neighbours is not None, "MFC requires max_neighbours input."
    if cfg.mpnn_type == "SchNet":
        assert cfg.num_gaussians is not None, "SchNet requires num_gaussians input."
        assert cfg.num_filters is not None, "SchNet requires num_filters input."
        assert cfg.radius is not None, "SchNet requires radius input."
    if cfg.mpnn_type == "PNAPlus":
        assert cfg.envelope_exponent is not None
        assert cfg.num_radial is not None and cfg.radius is not None
    if cfg.mpnn_type == "DimeNet":
        for k in ("basis_emb_size", "envelope_exponent", "int_emb_size",
                  "out_emb_size", "num_after_skip", "num_before_skip",
                  "num_radial", "num_spherical", "radius"):
            assert getattr(cfg, k) is not None, f"DimeNet requires {k} input."
    if cfg.mpnn_type == "MACE":
        assert cfg.radius is not None and cfg.num_radial is not None
        assert cfg.max_ell is not None and cfg.max_ell >= 1
        assert cfg.node_max_ell is not None and cfg.node_max_ell >= 1
    return reg[cfg.mpnn_type](cfg=cfg)


def create_model_config(config: Dict[str, Any], verbosity: int = 0) -> HydraBase:
    """config = the full JSON dict's ["NeuralNetwork"] section after
    ``update_config`` (same contract as ref: create.py:35-82)."""
    return create_model(arch_config_from_dict(config))
