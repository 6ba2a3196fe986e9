"""Model families: the flagship agent-based engine lives in
reina_tpu.core; this package holds the auxiliary comparison models."""
