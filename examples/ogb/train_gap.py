"""ogb HOMO-LUMO gap example: CSV of SMILES -> rdkit-free molecular
graphs -> graph-level gap regression (ref: examples/ogb/train_gap.py;
shared logic in examples/smiles_gap_driver.py).

Real data:  python examples/ogb/train_gap.py --csv <download.csv>
Smoke:      python examples/ogb/train_gap.py --synthetic --num_epoch 3
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from smiles_gap_driver import main  # noqa: E402

if __name__ == "__main__":
    main("ogb")
