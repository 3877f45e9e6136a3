from .runtime import (
    EvalConfig,
    TestConfig,
    TrainConfig,
    parse_eval_config,
    parse_test_config,
    parse_train_config,
)
