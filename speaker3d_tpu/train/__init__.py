from speaker3d_tpu.train import losses, schedulers  # noqa: F401
from speaker3d_tpu.train.sv_train import (  # noqa: F401
    SVTrainConfig,
    init_sv_train_state,
    make_sv_train_step,
)
