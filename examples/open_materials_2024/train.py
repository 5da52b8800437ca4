"""open_materials_2024 example: OMat24 ASE-DB shards of rattled/AIMD inorganic crystals -> radius graphs
-> arraystore shards -> energy(-force) training (ref: the corresponding
reference driver examples/open_materials_2024/; parsing in hydragnn_tpu/data/gfm.py,
ASE-DB reader in hydragnn_tpu/data/asedb.py).

Real data:  python examples/open_materials_2024/train.py --preprocess --raw <download>
            && python examples/open_materials_2024/train.py
No-download smoke: python examples/open_materials_2024/train.py --synthetic --num_epoch 2
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from gfm_driver import main  # noqa: E402

if __name__ == "__main__":
    main("omat24", subdir="open_materials_2024")
