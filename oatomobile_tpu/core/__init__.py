"""Core abstractions: simulator/rl/agent/loop/dataset/benchmark/registry."""
