from hydragnn_tpu.lsms.enthalpy import (
    compute_formation_enthalpy,
    convert_raw_data_energy_to_gibbs,
    mixing_entropy,
)
from hydragnn_tpu.lsms.histogram_cutoff import compositional_histogram_cutoff
