from tpuvae.train.state import (  # noqa: F401
    TrainState,
    create_state,
    adam_with_adjustable_lr,
    set_learning_rate,
    get_learning_rate,
    param_count,
)
from tpuvae.train.loop import FitConfig, FitResult, fit, train_val_split  # noqa: F401
from tpuvae.train.objectives import (  # noqa: F401
    simple_vae_objective,
    cvae_objective,
    hybrid_objective,
    autoencoder_objective,
)
from tpuvae.train.checkpoint import (  # noqa: F401
    CheckpointManager,
    latest_train_state_dir,
    save_checkpoint,
    load_checkpoint,
    save_train_state,
    restore_train_state,
)
