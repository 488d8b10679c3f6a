from .objective import (GENERATION_FIELD_WEIGHTS, masked_field_accuracy,
                        masked_field_ce, sequence_ce, shift_right, token_ce,
                        weighted_average_accuracy)
from .pretrain import batch_iterator, pretrain_eval_step, pretrain_step
from .finetune import finetune_seq_step, finetune_token_step
from .generation import ablation_step, generation_step
from .runner import PretrainRunner, SupervisedRunner
from .state import (CheckpointManager, TrainState, create_train_state,
                    get_ema_params, get_grad_norm, make_optimizer,
                    make_schedule, params_ema)
