from mme_tpu.core.config import ExperimentConfig, arg_parse, config_from_args
