"""ani1x GFM example: raw format -> radius graphs -> arraystore shards ->
energy(-force) training (ref: the corresponding reference driver
examples/*/train.py; parsing in hydragnn_tpu/data/gfm.py).

Real data:  python examples/ani1x/train.py --preprocess --raw <download> &&
            python examples/ani1x/train.py --forces
No-download smoke: python examples/ani1x/train.py --synthetic --num_epoch 2
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from gfm_driver import main  # noqa: E402

if __name__ == "__main__":
    main("ani1x")
