from .serialization import z_order_encode, hilbert_encode, sfc_encode, SFC_ORDERS
