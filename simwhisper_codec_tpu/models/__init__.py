"""Model components: encoder/decoder transformers, frame-stack samplers, Vocos, codec."""
