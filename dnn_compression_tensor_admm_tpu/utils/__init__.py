from .checkpoint import (save_variables, load_variables, load_any_variables,
                         save_train_state, load_train_state)
from .flops import model_flops_params
