from hydragnn_tpu.hpo.search import random_search, suggest_config
from hydragnn_tpu.hpo.launch import slurm_launch_command
