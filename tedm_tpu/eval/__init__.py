"""Evaluation harnesses (reference: auxiliary/postprocessing/):

* ``run_tests``               — batch evaluation of a trained experiment
                                over JSRT val/test + NIH + Montgomery
                                (run_tests.py:27-162)
* ``testing_shared_weights``  — TEDM per-timestep + ensemble evaluation
                                (testing_shared_weights.py:28-144)

Outputs mirror the reference's ``{dataset}_predictions.pt`` artifacts as
numpy ``.npz`` files with the same keys (y_hat, y_star, dice, precision,
recall) and the same idempotent skip-unless-``--rerun`` behavior.
"""
