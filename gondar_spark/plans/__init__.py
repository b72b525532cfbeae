from .inspect import explain_str, pushed_filters, codegen_stage_count  # noqa: F401
