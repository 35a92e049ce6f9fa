from vcagan.eval.pesq_nb import pesq_batch, pesq_nb
from vcagan.eval.stoi import stoi_batch, stoi_estoi_batch
from vcagan.eval.stoi_np import estoi_np, stoi_np

__all__ = ["estoi_np", "pesq_batch", "pesq_nb", "stoi_batch", "stoi_estoi_batch", "stoi_np"]
