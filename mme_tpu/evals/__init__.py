from mme_tpu.evals.metrics import Metrics, confusion_matrix, scores_from_confusion
