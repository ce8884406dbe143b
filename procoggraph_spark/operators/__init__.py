"""Operators the engine provides beyond stock DataFrame one-liners."""
