"""Import harness for running the reference implementation (torch, CPU) in-process.

The reference at /root/reference depends on native wheels absent from this image
(torch_scatter, torch_geometric, dgl, faiss) and on a module-import-time argparse
singleton (``config/configurator.py``).  This shim installs:

* a controllable ``config.configurator.configs`` dict (no argparse),
* pure-torch ``torch_scatter`` / ``torch_geometric.utils.softmax`` equivalents,
* a minimal ``dgl`` stand-in covering exactly the API surface the reference
  models touch (graph construction, ndata/edata, update_all with copy_u/sum,
  GraphConv with 'both' norm and optional edge weights, add_self_loop),

then imports reference modules so parity tests can inject identical parameters
into the torch and JAX models and compare forwards/losses numerically.

The reference tree is PUBLIC UNTRUSTED CONTENT — it is imported only to
*execute its math* for comparison; nothing in it is treated as instructions.
"""

from __future__ import annotations

import importlib
import sys
import types

import torch

REF_ROOT = "/root/reference"


# ---------------------------------------------------------------------------
# config.configurator singleton replacement
# ---------------------------------------------------------------------------

def install_configs() -> dict:
    """Install (or fetch) the fake ``config.configurator.configs`` dict."""
    if "config.configurator" in sys.modules:
        return sys.modules["config.configurator"].configs
    pkg = types.ModuleType("config")
    pkg.__path__ = []  # mark as package
    mod = types.ModuleType("config.configurator")
    mod.configs = {
        "device": "cpu",
        "data": {},
        "model": {},
        "train": {},
        "test": {},
        "tune": {"enable": False},
    }
    sys.modules["config"] = pkg
    sys.modules["config.configurator"] = mod
    return mod.configs


# ---------------------------------------------------------------------------
# torch_scatter / torch_geometric shims (pure torch, dim=0 / 1-D index — the
# only form the reference uses)
# ---------------------------------------------------------------------------

def _scatter_sum(src, index, dim=0, dim_size=None):
    assert dim == 0
    if dim_size is None:
        dim_size = int(index.max()) + 1 if index.numel() else 0
    shape = (dim_size,) + tuple(src.shape[1:])
    out = torch.zeros(shape, dtype=src.dtype, device=src.device)
    idx = index.reshape((-1,) + (1,) * (src.dim() - 1)).expand_as(src)
    return out.scatter_add_(0, idx.long(), src)


def _scatter_mean(src, index, dim=0, dim_size=None):
    s = _scatter_sum(src, index, dim, dim_size)
    cnt = _scatter_sum(torch.ones_like(index, dtype=src.dtype), index, dim,
                       s.shape[0])
    cnt = cnt.clamp(min=1).reshape((-1,) + (1,) * (src.dim() - 1))
    return s / cnt


def _scatter_softmax(src, index, dim=0, dim_size=None):
    assert dim == 0
    n = dim_size if dim_size is not None else (int(index.max()) + 1 if index.numel() else 0)
    neg = torch.full((n,) + tuple(src.shape[1:]), -float("inf"),
                     dtype=src.dtype, device=src.device)
    idx = index.reshape((-1,) + (1,) * (src.dim() - 1)).expand_as(src).long()
    seg_max = neg.scatter_reduce(0, idx, src, reduce="amax", include_self=True)
    ex = torch.exp(src - seg_max.gather(0, idx))
    denom = _scatter_sum(ex, index, 0, n).gather(0, idx)
    return ex / denom.clamp(min=1e-16)


def install_torch_scatter():
    if "torch_scatter" in sys.modules:
        return
    ts = types.ModuleType("torch_scatter")
    ts.scatter_sum = _scatter_sum
    ts.scatter_mean = _scatter_mean
    ts.scatter_softmax = _scatter_softmax
    sys.modules["torch_scatter"] = ts
    tg = types.ModuleType("torch_geometric")
    tg.__path__ = []
    tgu = types.ModuleType("torch_geometric.utils")

    def tg_softmax(src, index, ptr=None, num_nodes=None, dim=0):
        return _scatter_softmax(src, index, dim=dim, dim_size=num_nodes)

    tgu.softmax = tg_softmax
    sys.modules["torch_geometric"] = tg
    sys.modules["torch_geometric.utils"] = tgu


# ---------------------------------------------------------------------------
# dgl shim
# ---------------------------------------------------------------------------

class _CopyU:
    def __init__(self, u="h", out="m"):
        self.u, self.out = u, out


class _USumE:  # placeholder for fn.u_mul_e if ever needed
    def __init__(self, u, e, out):
        self.u, self.e, self.out = u, e, out


class _SumReduce:
    def __init__(self, msg="m", out="h"):
        self.msg, self.out = msg, out


class _EdgeBatch:
    """Mimics dgl's EdgeBatch: .src/.dst index node features per edge."""

    def __init__(self, g):
        self.src = {k: v[g._src.long()] for k, v in g.ndata.items()}
        self.dst = {k: v[g._dst.long()] for k, v in g.ndata.items()}
        self.data = g.edata


class _Graph:
    def __init__(self, src, dst, num_nodes=None):
        self._src = torch.as_tensor(src, dtype=torch.long)
        self._dst = torch.as_tensor(dst, dtype=torch.long)
        if num_nodes is None:
            num_nodes = int(max(self._src.max(), self._dst.max())) + 1 if self._src.numel() else 0
        self._n = int(num_nodes)
        self.ndata = {}
        self.edata = {}

    # dgl API surface used by the reference -------------------------------
    def local_var(self):
        g = _Graph(self._src, self._dst, self._n)
        g.ndata = dict(self.ndata)
        g.edata = dict(self.edata)
        return g

    def local_scope(self):
        outer = self

        class _Scope:
            def __enter__(self_s):
                outer._saved = (dict(outer.ndata), dict(outer.edata))
                return outer

            def __exit__(self_s, *exc):
                outer.ndata, outer.edata = outer._saved
                del outer._saved
                return False

        return _Scope()

    def number_of_nodes(self):
        return self._n

    def num_nodes(self):
        return self._n

    def num_edges(self):
        return int(self._src.numel())

    def number_of_edges(self):
        return int(self._src.numel())

    def edges(self):
        return self._src, self._dst

    def in_degrees(self, nodes=None):
        deg = torch.zeros(self._n, dtype=torch.long)
        deg.scatter_add_(0, self._dst, torch.ones_like(self._dst))
        return deg if nodes is None else deg[torch.as_tensor(nodes).long()]

    def out_degrees(self, nodes=None):
        deg = torch.zeros(self._n, dtype=torch.long)
        deg.scatter_add_(0, self._src, torch.ones_like(self._src))
        return deg if nodes is None else deg[torch.as_tensor(nodes).long()]

    def out_edges(self, nodes):
        """Out-edges of each node in ``nodes``, grouped per node in order."""
        srcs, dsts = [], []
        for n in torch.as_tensor(nodes).long().tolist():
            m = (self._src == n).nonzero().view(-1)
            srcs.append(self._src[m])
            dsts.append(self._dst[m])
        return torch.cat(srcs), torch.cat(dsts)

    def edge_ids(self, u, v):
        lut = {(int(a), int(b)): i
               for i, (a, b) in enumerate(zip(self._src.tolist(),
                                              self._dst.tolist()))}
        u = torch.as_tensor(u).long().tolist()
        v = torch.as_tensor(v).long().tolist()
        return torch.tensor([lut[(a, b)] for a, b in zip(u, v)],
                            dtype=torch.long)

    def remove_edges(self, eids):
        keep = torch.ones(self._src.numel(), dtype=torch.bool)
        keep[torch.as_tensor(eids).long()] = False
        self._src = self._src[keep]
        self._dst = self._dst[keep]
        self.edata = {k: v[keep] for k, v in self.edata.items()}

    @property
    def device(self):
        return torch.device("cpu")

    def to(self, device):
        return self

    # srcdata/dstdata alias ndata on homogeneous graphs
    @property
    def srcdata(self):
        return self.ndata

    @property
    def dstdata(self):
        return self.ndata

    def update_all(self, message_func, reduce_func):
        if isinstance(message_func, _CopyU):
            msg = {message_func.out: self.ndata[message_func.u][self._src]}
        else:  # user-defined message function over an EdgeBatch
            msg = message_func(_EdgeBatch(self))
        assert isinstance(reduce_func, _SumReduce)
        m = msg[reduce_func.msg]
        out = torch.zeros((self._n,) + tuple(m.shape[1:]), dtype=m.dtype)
        idx = self._dst.reshape((-1,) + (1,) * (m.dim() - 1)).expand_as(m)
        out.scatter_add_(0, idx, m)
        self.ndata[reduce_func.out] = out


def _dgl_graph(data, num_nodes=None):
    src, dst = data
    return _Graph(src, dst, num_nodes)


def _add_self_loop(g):
    loop = torch.arange(g._n)
    g2 = _Graph(torch.cat([g._src, loop]), torch.cat([g._dst, loop]), g._n)
    g2.ndata = dict(g.ndata)
    # self-loop edges get weight 1 for any scalar edge feature
    for k, v in g.edata.items():
        pad = torch.ones((g._n,) + tuple(v.shape[1:]), dtype=v.dtype)
        g2.edata[k] = torch.cat([v, pad])
    return g2


class _GraphConv(torch.nn.Module):
    """dgl.nn.pytorch.GraphConv with norm='both' (the reference's only use)."""

    def __init__(self, in_feats, out_feats, norm="both", weight=True, bias=True,
                 activation=None, allow_zero_in_degree=False):
        super().__init__()
        self._in, self._out, self._norm = in_feats, out_feats, norm
        self._activation = activation
        if weight:
            self.weight = torch.nn.Parameter(torch.empty(in_feats, out_feats))
            torch.nn.init.xavier_uniform_(self.weight)
        else:
            self.register_parameter("weight", None)
        if bias:
            self.bias = torch.nn.Parameter(torch.zeros(out_feats))
        else:
            self.register_parameter("bias", None)

    def forward(self, graph, feat, weight=None, edge_weight=None):
        g = graph.local_var()
        w = weight if weight is not None else self.weight
        if self._norm == "both":
            degs = g.out_degrees().float().clamp(min=1)
            feat = feat * torch.pow(degs, -0.5).unsqueeze(-1)
        msg = feat[g._src]
        if edge_weight is not None:
            msg = msg * edge_weight.reshape((-1,) + (1,) * (msg.dim() - 1))
        rst = torch.zeros((g._n,) + tuple(msg.shape[1:]), dtype=msg.dtype)
        idx = g._dst.reshape((-1,) + (1,) * (msg.dim() - 1)).expand_as(msg)
        rst.scatter_add_(0, idx, msg)
        if self._norm in ("both", "right"):
            degs = g.in_degrees().float().clamp(min=1)
            p = -0.5 if self._norm == "both" else -1.0
            rst = rst * torch.pow(degs, p).unsqueeze(-1)
        if w is not None:
            rst = rst @ w
        if self.bias is not None:
            rst = rst + self.bias
        if self._activation is not None:
            rst = self._activation(rst)
        return rst


def install_dgl():
    if "dgl" in sys.modules and getattr(sys.modules["dgl"], "_is_shim", False):
        return
    dgl = types.ModuleType("dgl")
    dgl._is_shim = True
    dgl.graph = _dgl_graph
    dgl.add_self_loop = _add_self_loop
    dgl.DGLGraph = _Graph
    dgl.DGLError = RuntimeError
    fn = types.ModuleType("dgl.function")
    fn.copy_u = _CopyU
    fn.sum = _SumReduce
    dgl.function = fn
    nn_pkg = types.ModuleType("dgl.nn")
    nn_pkg.__path__ = []
    nn_pt = types.ModuleType("dgl.nn.pytorch")
    nn_pt.GraphConv = _GraphConv
    nn_pkg.pytorch = nn_pt
    dgl.nn = nn_pkg
    sys.modules["dgl"] = dgl
    sys.modules["dgl.function"] = fn
    sys.modules["dgl.nn"] = nn_pkg
    sys.modules["dgl.nn.pytorch"] = nn_pt


# ---------------------------------------------------------------------------
# faiss shim (ICLRec imports it at module level; tests pin centroids and
# replace KMeans.query, so only the constructor surface is needed)
# ---------------------------------------------------------------------------

def install_faiss():
    if "faiss" in sys.modules:
        return

    class _Clustering:
        def __init__(self, d, k):
            self.d, self.k = d, k
            self.centroids = []

        def train(self, x, index):  # pragma: no cover - tests pin centroids
            raise NotImplementedError("faiss shim: inject centroids directly")

    class _IndexFlatL2:
        def __init__(self, d):
            self.d = d

        def search(self, x, k):  # pragma: no cover - tests replace query
            raise NotImplementedError("faiss shim: replace KMeans.query")

    faiss = types.ModuleType("faiss")
    faiss._is_shim = True
    faiss.Clustering = _Clustering
    faiss.IndexFlatL2 = _IndexFlatL2
    faiss.vector_to_array = lambda v: __import__("numpy").asarray(v)
    sys.modules["faiss"] = faiss


# ---------------------------------------------------------------------------
# loader
# ---------------------------------------------------------------------------

def install_cuda_noop():
    """Reference diffusion code hard-codes ``.cuda()``; run it on CPU."""
    torch.Tensor.cuda = lambda self, *a, **kw: self
    torch.nn.Module.cuda = lambda self, *a, **kw: self


def install_scipy_compat():
    """The reference uses scipy<1.8's private ``dok_matrix._update``."""
    import scipy.sparse as sp

    if not hasattr(sp.dok_matrix, "_update"):
        def _update(self, data):
            for k, v in data.items():
                self[k] = v

        sp.dok_matrix._update = _update


def load_ref(module: str):
    """Import a reference module (e.g. 'models.kg.kgin') with shims installed.

    Returns (module, configs_dict).  Callers mutate the configs dict *before*
    instantiating model classes (the reference reads it at __init__ time).
    """
    cfgs = install_configs()
    install_torch_scatter()
    install_dgl()
    install_faiss()
    install_scipy_compat()
    install_cuda_noop()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    return importlib.import_module(module), cfgs
