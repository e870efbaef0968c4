"""Evaluation: intelligibility/quality metrics and corpus harnesses."""
