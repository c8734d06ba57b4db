from auto_ts_spark.models import ar, base, fourier, ml, registry, stats, var_model

__all__ = ["base", "fourier", "ar", "var_model", "ml", "registry", "stats"]
