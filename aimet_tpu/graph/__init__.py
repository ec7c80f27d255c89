from .connected_graph import ConnectedGraph, Op, Product
