from intrepppid_tpu.serve.coalesce import CoalescingScorer
from intrepppid_tpu.serve.engine import ScoringEngine
from intrepppid_tpu.serve.server import PPIServer

__all__ = ["CoalescingScorer", "ScoringEngine", "PPIServer"]
