from accunet_tpu.utils.trace_report import module_times, top_ops  # noqa: F401
