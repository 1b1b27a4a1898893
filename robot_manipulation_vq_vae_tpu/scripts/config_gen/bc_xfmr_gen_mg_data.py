"""BC-Transformer configs over MimicGen-generated datasets (reference
``robomimic/scripts/config_gen/bc_xfmr_gen_mg_data.py``): same generator,
mg-3000 dataset preset by default."""

from robot_manipulation_vq_vae_tpu.scripts.config_gen.bc_xfmr_gen import (
    make_config,
)
from robot_manipulation_vq_vae_tpu.scripts.config_gen.gen_common import (
    emit,
    standard_argparser,
)

if __name__ == "__main__":
    parser = standard_argparser("bc_xfmr_mg")
    parser.set_defaults(dataset_preset="mg-3000")
    args = parser.parse_args()
    emit(make_config(args), args)
