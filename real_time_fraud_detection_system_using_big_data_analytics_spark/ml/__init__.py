from .fraud_pipeline import FraudPipeline, PAYSIM_SCHEMA

__all__ = ["FraudPipeline", "PAYSIM_SCHEMA"]
