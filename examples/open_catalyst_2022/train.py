"""open_catalyst_2022 example: OC22 extxyz trajectory frames (total-energy + forces PBC slabs) -> radius graphs
-> arraystore shards -> energy(-force) training (ref: the corresponding
reference driver examples/open_catalyst_2022/; parsing in hydragnn_tpu/data/gfm.py,
ASE-DB reader in hydragnn_tpu/data/asedb.py).

Real data:  python examples/open_catalyst_2022/train.py --preprocess --raw <download>
            && python examples/open_catalyst_2022/train.py
No-download smoke: python examples/open_catalyst_2022/train.py --synthetic --num_epoch 2
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from gfm_driver import main  # noqa: E402

if __name__ == "__main__":
    main("oc22", subdir="open_catalyst_2022")
