from curvature_tpu.eval.metrics import (
    accuracy, confidence, negative_log_likelihood, predictive_entropy,
    expected_calibration_error, calibration_curve, binned_kl_distance,
    linear_interpolation, get_eigenvalues, auroc, rmse, gaussian_nll,
)
from curvature_tpu.eval.evaluate import (
    eval_nn, eval_bnn, eval_nn_and_bnn, make_forward_fn, make_ensemble_fn,
)
from curvature_tpu.eval.attacks import fgsm, eval_fgsm, eval_fgsm_bnn
from curvature_tpu.eval.predictor import BayesianPredictor, Prediction
from curvature_tpu.eval.predictive import (
    probit_mean_field, laplace_bridge, eval_bnn_closed_form,
    eval_bnn_linearized, make_linearized_ensemble_fn,
    eval_bnn_regression,
)
from curvature_tpu.eval.marglik import (
    dataset_map_nll, log_marginal_likelihood,
)
from curvature_tpu.eval.calibrate import (
    fit_temperature, temperature_scale, eval_nn_temperature,
)
from curvature_tpu.eval.fidelity import fidelity_report
from curvature_tpu.eval.influence import (
    influence_scores, self_influence, loss_grad_matrix,
    per_example_grad_matrix,
)

__all__ = [
    "influence_scores", "self_influence", "loss_grad_matrix",
    "per_example_grad_matrix",
    "accuracy", "confidence", "negative_log_likelihood", "predictive_entropy",
    "expected_calibration_error", "calibration_curve", "binned_kl_distance",
    "linear_interpolation", "get_eigenvalues", "auroc", "rmse",
    "gaussian_nll",
    "eval_nn", "eval_bnn", "eval_nn_and_bnn", "make_forward_fn",
    "make_ensemble_fn", "fgsm", "eval_fgsm", "eval_fgsm_bnn",
    "BayesianPredictor", "Prediction",
    "probit_mean_field", "laplace_bridge", "eval_bnn_closed_form",
    "eval_bnn_linearized", "make_linearized_ensemble_fn",
    "eval_bnn_regression",
    "dataset_map_nll", "log_marginal_likelihood",
    "fit_temperature", "temperature_scale", "eval_nn_temperature",
    "fidelity_report",
]
