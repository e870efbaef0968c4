"""Training: reconstruction losses, optimizer with encoder freezing, sharded step."""
