"""Stateful components: cuckoo/bloom seen-set shards, checkpoints."""
