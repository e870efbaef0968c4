"""Device-mesh parallelism: sharding rules, data distribution, collectives."""
