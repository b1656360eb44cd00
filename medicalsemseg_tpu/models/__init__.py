from medicalsemseg_tpu.models.factory import build_model  # noqa: F401
