from .datasets import (DEFAULT_PRETRAIN_DATASETS, concatenate_pretrain,
                       load_finetune, load_pretrain)
