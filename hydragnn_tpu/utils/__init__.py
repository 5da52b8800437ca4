from hydragnn_tpu.utils.time_utils import Timer, print_timers
from hydragnn_tpu.utils.print_utils import print_distributed, log, setup_log
