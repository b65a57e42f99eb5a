from accunet_tpu.eval.evaluate import evaluate_model, EvalResult
