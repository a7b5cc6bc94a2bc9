// Native WFST graph-plane kernels.
//
// C++ mirror of old_kaldi_git_tpu/fst/algorithms.py (same semantics, same
// tests): composition with the 3-state epsilon filter, epsilon-removing
// subset determinization with output strings (DeterminizeStar), encoded
// Moore minimization, local epsilon removal, connection.  This is the
// component where the reference is native too (OpenFst + src/fstext,
// SURVEY.md §7.4): pointer-chasing graph algorithms on the CPU, used at
// graph-build time for large lexicons/LMs where the Python implementation
// is too slow.
//
// Exposed through a C ABI (okt_*) consumed via ctypes from
// old_kaldi_git_tpu/fst/native.py.  Build: make -C cpp.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <stdexcept>
#include <limits>
#include <map>
#include <queue>
#include <unordered_map>
#include <vector>

namespace {

constexpr float kInf = std::numeric_limits<float>::infinity();

struct Arc {
  int32_t ilabel;
  int32_t olabel;
  float weight;
  int32_t nextstate;
};

struct Fst {
  std::vector<std::vector<Arc>> arcs;
  std::vector<float> finals;  // kInf = not final
  int32_t start = -1;

  int32_t AddState() {
    arcs.emplace_back();
    finals.push_back(kInf);
    return static_cast<int32_t>(arcs.size()) - 1;
  }
  size_t NumStates() const { return arcs.size(); }
  size_t NumArcs() const {
    size_t n = 0;
    for (const auto& a : arcs) n += a.size();
    return n;
  }
};

double LogAdd(double a, double b) {
  // tropical-domain logadd: -log(e^-a + e^-b)
  if (a == kInf) return b;
  if (b == kInf) return a;
  double m = std::min(a, b);
  return m - std::log1p(std::exp(-std::fabs(a - b)));
}

// ---------------------------------------------------------------------------
// connect (trim)
// ---------------------------------------------------------------------------

void Connect(Fst* fst) {
  if (fst->start < 0) {
    fst->arcs.clear();
    fst->finals.clear();
    return;
  }
  size_t n = fst->NumStates();
  std::vector<char> acc(n, 0), coacc(n, 0);
  std::vector<int32_t> stack{fst->start};
  acc[fst->start] = 1;
  while (!stack.empty()) {
    int32_t s = stack.back();
    stack.pop_back();
    for (const Arc& a : fst->arcs[s])
      if (!acc[a.nextstate]) {
        acc[a.nextstate] = 1;
        stack.push_back(a.nextstate);
      }
  }
  std::vector<std::vector<int32_t>> rev(n);
  for (size_t s = 0; s < n; ++s)
    for (const Arc& a : fst->arcs[s]) rev[a.nextstate].push_back(s);
  for (size_t s = 0; s < n; ++s)
    if (fst->finals[s] != kInf) {
      coacc[s] = 1;
      stack.push_back(s);
    }
  while (!stack.empty()) {
    int32_t s = stack.back();
    stack.pop_back();
    for (int32_t p : rev[s])
      if (!coacc[p]) {
        coacc[p] = 1;
        stack.push_back(p);
      }
  }
  std::vector<int32_t> remap(n, -1);
  int32_t next = 0;
  for (size_t s = 0; s < n; ++s)
    if (acc[s] && coacc[s]) remap[s] = next++;
  Fst out;
  out.arcs.resize(next);
  out.finals.assign(next, kInf);
  for (size_t s = 0; s < n; ++s) {
    if (remap[s] < 0) continue;
    for (const Arc& a : fst->arcs[s])
      if (remap[a.nextstate] >= 0)
        out.arcs[remap[s]].push_back(
            {a.ilabel, a.olabel, a.weight, remap[a.nextstate]});
    out.finals[remap[s]] = fst->finals[s];
  }
  out.start = remap[fst->start] >= 0 ? remap[fst->start] : -1;
  *fst = std::move(out);
}

// ---------------------------------------------------------------------------
// composition with the 3-state epsilon filter
// ---------------------------------------------------------------------------

struct TripleHash {
  size_t operator()(const std::tuple<int32_t, int32_t, int32_t>& t) const {
    auto [a, b, c] = t;
    return (static_cast<size_t>(a) * 1000003u + b) * 1000003u + c;
  }
};

Fst* Compose(const Fst& f1, const Fst& f2) {
  auto* out = new Fst();
  if (f1.start < 0 || f2.start < 0) return out;
  // index f2 by (state, ilabel)
  std::vector<std::unordered_map<int32_t, std::vector<const Arc*>>> idx2(
      f2.NumStates());
  for (size_t s = 0; s < f2.NumStates(); ++s)
    for (const Arc& a : f2.arcs[s]) idx2[s][a.ilabel].push_back(&a);

  using Key = std::tuple<int32_t, int32_t, int32_t>;
  std::unordered_map<Key, int32_t, TripleHash> ids;
  std::vector<Key> stack;
  Key start{f1.start, f2.start, 0};
  ids[start] = out->AddState();
  out->start = 0;
  stack.push_back(start);
  while (!stack.empty()) {
    Key key = stack.back();
    stack.pop_back();
    auto [s1, s2, f] = key;
    int32_t src = ids[key];
    float wf = f1.finals[s1] + f2.finals[s2];
    if (f1.finals[s1] != kInf && f2.finals[s2] != kInf) out->finals[src] = wf;

    auto emit = [&](int32_t il, int32_t ol, float w, int32_t n1, int32_t n2,
                    int32_t nf) {
      Key nkey{n1, n2, nf};
      auto it = ids.find(nkey);
      if (it == ids.end()) {
        it = ids.emplace(nkey, out->AddState()).first;
        stack.push_back(nkey);
      }
      out->arcs[src].push_back({il, ol, w, it->second});
    };

    for (const Arc& a1 : f1.arcs[s1]) {
      if (a1.olabel == 0) {
        if (f != 2) emit(a1.ilabel, 0, a1.weight, a1.nextstate, s2, 1);
      } else {
        auto it = idx2[s2].find(a1.olabel);
        if (it != idx2[s2].end())
          for (const Arc* a2 : it->second)
            emit(a1.ilabel, a2->olabel, a1.weight + a2->weight, a1.nextstate,
                 a2->nextstate, 0);
      }
    }
    if (f != 1) {
      auto it = idx2[s2].find(0);
      if (it != idx2[s2].end())
        for (const Arc* a2 : it->second)
          emit(0, a2->olabel, a2->weight, s1, a2->nextstate, 2);
    }
  }
  Connect(out);
  return out;
}

// ---------------------------------------------------------------------------
// determinize-star (subset determinization with output strings)
// ---------------------------------------------------------------------------

// output strings interned in a prefix tree: id 0 = empty; node = (parent,
// label)
struct StringTable {
  std::vector<std::pair<int32_t, int32_t>> nodes{{-1, -1}};  // parent, label
  std::map<std::pair<int32_t, int32_t>, int32_t> index;

  int32_t Append(int32_t id, int32_t label) {
    auto key = std::make_pair(id, label);
    auto it = index.find(key);
    if (it != index.end()) return it->second;
    nodes.emplace_back(id, label);
    int32_t nid = static_cast<int32_t>(nodes.size()) - 1;
    index[key] = nid;
    return nid;
  }
  std::vector<int32_t> Expand(int32_t id) const {
    std::vector<int32_t> out;
    while (id > 0) {
      out.push_back(nodes[id].second);
      id = nodes[id].first;
    }
    std::reverse(out.begin(), out.end());
    return out;
  }
  size_t Size(int32_t id) const {
    size_t n = 0;
    while (id > 0) {
      ++n;
      id = nodes[id].first;
    }
    return n;
  }
};

struct Triple {
  int32_t state;
  double weight;
  int32_t str;  // StringTable id
  bool operator<(const Triple& o) const {
    if (state != o.state) return state < o.state;
    if (str != o.str) return str < o.str;
    return weight < o.weight;
  }
  bool operator==(const Triple& o) const {
    return state == o.state && str == o.str &&
           std::fabs(weight - o.weight) < 1e-9;
  }
};

struct SubsetHash {
  size_t operator()(const std::vector<Triple>& v) const {
    size_t h = 1469598103934665603ull;
    for (const auto& t : v) {
      h = (h ^ static_cast<size_t>(t.state)) * 1099511628211ull;
      h = (h ^ static_cast<size_t>(t.str)) * 1099511628211ull;
      h = (h ^ std::hash<int64_t>()(
               static_cast<int64_t>(std::llround(t.weight * 1e6)))) *
          1099511628211ull;
    }
    return h;
  }
};
struct SubsetEq {
  bool operator()(const std::vector<Triple>& a,
                  const std::vector<Triple>& b) const {
    if (a.size() != b.size()) return false;
    for (size_t i = 0; i < a.size(); ++i)
      if (!(a[i] == b[i])) return false;
    return true;
  }
};

class Determinizer {
 public:
  Determinizer(const Fst& in, bool use_log, int64_t max_states)
      : in_(in), use_log_(use_log), max_states_(max_states) {}

  Fst* Run() {
    auto* out = new Fst();
    if (in_.start < 0) return out;
    std::vector<Triple> start_closure =
        Closure({{in_.start, 0.0, 0}});
    double w0;
    int32_t p0;
    std::vector<Triple> norm0 = Normalize(start_closure, &w0, &p0);
    ids_[norm0] = out->AddState();
    out->start = 0;
    if (w0 != 0.0 || p0 != 0) {
      int32_t real_start = out->AddState();
      out->start = real_start;
      std::vector<int32_t> labels = strings_.Expand(p0);
      if (labels.empty()) labels.push_back(0);
      int32_t cur = real_start;
      for (size_t i = 0; i < labels.size(); ++i) {
        float w = i == 0 ? static_cast<float>(w0) : 0.0f;
        int32_t nxt = (i + 1 == labels.size()) ? ids_[norm0] : out->AddState();
        out->arcs[cur].push_back({0, labels[i], w, nxt});
        cur = nxt;
      }
    }
    std::vector<std::vector<Triple>> stack{norm0};
    while (!stack.empty()) {
      std::vector<Triple> subset = std::move(stack.back());
      stack.pop_back();
      int32_t src = ids_[subset];
      // finals
      std::map<int32_t, double> final_items;  // str -> weight
      for (const Triple& t : subset) {
        if (in_.finals[t.state] != kInf) {
          double wt = t.weight + in_.finals[t.state];
          auto it = final_items.find(t.str);
          if (it == final_items.end())
            final_items[t.str] = wt;
          else
            it->second = Plus(it->second, wt);
        }
      }
      for (const auto& [str, w] : final_items) {
        if (str == 0) {
          out->finals[src] = static_cast<float>(w);
        } else {
          std::vector<int32_t> labels = strings_.Expand(str);
          int32_t cur = src;
          for (size_t i = 0; i < labels.size(); ++i) {
            int32_t nxt = out->AddState();
            out->arcs[cur].push_back(
                {0, labels[i], i == 0 ? static_cast<float>(w) : 0.0f, nxt});
            cur = nxt;
          }
          out->finals[cur] = 0.0f;
        }
      }
      // moves grouped by ilabel
      std::map<int32_t, std::vector<Triple>> moves;
      for (const Triple& t : subset)
        for (const Arc& a : in_.arcs[t.state])
          if (a.ilabel != 0) {
            int32_t ns = a.olabel == 0 ? t.str : strings_.Append(t.str, a.olabel);
            moves[a.ilabel].push_back({a.nextstate, t.weight + a.weight, ns});
          }
      for (auto& [il, triples] : moves) {
        std::vector<Triple> closed = Closure(triples);
        double w_common;
        int32_t prefix;
        std::vector<Triple> norm = Normalize(closed, &w_common, &prefix);
        auto it = ids_.find(norm);
        if (it == ids_.end()) {
          if (static_cast<int64_t>(ids_.size()) >= max_states_)
            throw std::runtime_error("determinize_star: state blow-up");
          it = ids_.emplace(norm, out->AddState()).first;
          stack.push_back(norm);
        }
        int32_t dest = it->second;
        std::vector<int32_t> labels = strings_.Expand(prefix);
        if (labels.size() <= 1) {
          out->arcs[src].push_back({il, labels.empty() ? 0 : labels[0],
                                    static_cast<float>(w_common), dest});
        } else {
          int32_t cur = src;
          for (size_t i = 0; i < labels.size(); ++i) {
            bool last = i + 1 == labels.size();
            int32_t nxt = last ? dest : out->AddState();
            out->arcs[cur].push_back({i == 0 ? il : 0, labels[i],
                                      i == 0 ? static_cast<float>(w_common)
                                             : 0.0f,
                                      nxt});
            cur = nxt;
          }
        }
      }
    }
    return out;
  }

 private:
  double Plus(double a, double b) const {
    return use_log_ ? LogAdd(a, b) : std::min(a, b);
  }

  std::vector<Triple> Closure(const std::vector<Triple>& init) {
    std::map<std::pair<int32_t, int32_t>, double> best;  // (state,str) -> w
    std::vector<Triple> work(init);
    while (!work.empty()) {
      Triple t = work.back();
      work.pop_back();
      auto key = std::make_pair(t.state, t.str);
      auto it = best.find(key);
      if (it != best.end()) {
        double merged = Plus(it->second, t.weight);
        if (!use_log_) {
          if (merged >= it->second) continue;  // no improvement
        } else if (std::fabs(merged - it->second) < 1e-12) {
          continue;
        }
        it->second = merged;
        t.weight = merged;
      } else {
        best[key] = t.weight;
      }
      for (const Arc& a : in_.arcs[t.state])
        if (a.ilabel == 0) {
          int32_t ns = a.olabel == 0 ? t.str : strings_.Append(t.str, a.olabel);
          if (strings_.Size(ns) > 10000)
            throw std::runtime_error(
                "determinize_star: output string blow-up (eps cycle)");
          work.push_back({a.nextstate, t.weight + a.weight, ns});
        }
    }
    std::vector<Triple> out;
    out.reserve(best.size());
    for (const auto& [key, w] : best)
      out.push_back({key.first, w, key.second});
    return out;
  }

  std::vector<Triple> Normalize(std::vector<Triple> items, double* w_common,
                                int32_t* prefix) {
    std::sort(items.begin(), items.end());
    double wc = items[0].weight;
    for (size_t i = 1; i < items.size(); ++i) wc = Plus(wc, items[i].weight);
    // longest common prefix of the strings
    std::vector<int32_t> pre = strings_.Expand(items[0].str);
    for (size_t i = 1; i < items.size() && !pre.empty(); ++i) {
      std::vector<int32_t> s = strings_.Expand(items[i].str);
      size_t k = 0;
      while (k < pre.size() && k < s.size() && pre[k] == s[k]) ++k;
      pre.resize(k);
    }
    int32_t pid = 0;
    for (int32_t l : pre) pid = strings_.Append(pid, l);
    for (auto& t : items) {
      t.weight -= wc;
      // strip prefix
      std::vector<int32_t> s = strings_.Expand(t.str);
      int32_t nid = 0;
      for (size_t k = pre.size(); k < s.size(); ++k)
        nid = strings_.Append(nid, s[k]);
      t.str = nid;
    }
    std::sort(items.begin(), items.end());
    *w_common = wc;
    *prefix = pid;
    return items;
  }

  const Fst& in_;
  bool use_log_;
  int64_t max_states_;
  StringTable strings_;
  std::unordered_map<std::vector<Triple>, int32_t, SubsetHash, SubsetEq> ids_;
};

// ---------------------------------------------------------------------------
// minimize (encoded, Moore refinement)
// ---------------------------------------------------------------------------

Fst* MinimizeEncoded(const Fst& in) {
  size_t n = in.NumStates();
  auto* out = new Fst();
  if (n == 0) return out;
  std::vector<int32_t> part(n);
  {
    std::map<int64_t, int32_t> blocks;  // quantized final weight -> block
    for (size_t s = 0; s < n; ++s) {
      int64_t key = in.finals[s] == kInf
                        ? std::numeric_limits<int64_t>::min()
                        : std::llround(in.finals[s] * 1e9);
      auto it = blocks.find(key);
      if (it == blocks.end()) it = blocks.emplace(key, blocks.size()).first;
      part[s] = it->second;
    }
  }
  bool changed = true;
  while (changed) {
    std::map<std::vector<int64_t>, int32_t> sig2block;
    std::vector<int32_t> new_part(n);
    for (size_t s = 0; s < n; ++s) {
      std::vector<int64_t> sig;
      sig.push_back(part[s]);
      std::vector<std::tuple<int32_t, int32_t, int64_t, int32_t>> arcs;
      for (const Arc& a : in.arcs[s])
        arcs.emplace_back(a.ilabel, a.olabel, std::llround(a.weight * 1e9),
                          part[a.nextstate]);
      std::sort(arcs.begin(), arcs.end());
      for (auto& [il, ol, w, p] : arcs) {
        sig.push_back(il);
        sig.push_back(ol);
        sig.push_back(w);
        sig.push_back(p);
      }
      auto it = sig2block.find(sig);
      if (it == sig2block.end())
        it = sig2block.emplace(std::move(sig), sig2block.size()).first;
      new_part[s] = it->second;
    }
    std::vector<char> seen_blocks(sig2block.size() + n, 0);
    size_t old_count = 0, new_count = sig2block.size();
    {
      std::vector<char> seen(n + 1, 0);
      for (size_t s = 0; s < n; ++s)
        if (!seen[part[s]]) {
          seen[part[s]] = 1;
          ++old_count;
        }
    }
    changed = new_count != old_count;
    part = std::move(new_part);
  }
  std::unordered_map<int32_t, int32_t> reps;
  for (size_t s = 0; s < n; ++s)
    if (!reps.count(part[s])) reps[part[s]] = out->AddState();
  std::vector<char> emitted(n + reps.size(), 0);
  for (size_t s = 0; s < n; ++s) {
    int32_t b = part[s];
    if (emitted[b]) continue;
    emitted[b] = 1;
    for (const Arc& a : in.arcs[s])
      out->arcs[reps[b]].push_back(
          {a.ilabel, a.olabel, a.weight, reps[part[a.nextstate]]});
    if (in.finals[s] != kInf) out->finals[reps[b]] = in.finals[s];
  }
  out->start = reps[part[in.start]];
  Connect(out);
  return out;
}

// ---------------------------------------------------------------------------
// remove-eps-local
// ---------------------------------------------------------------------------

void RemoveEpsLocal(Fst* fst) {
  bool changed = true;
  while (changed) {
    changed = false;
    size_t n = fst->NumStates();
    std::vector<int32_t> incoming(n, 0);
    for (size_t s = 0; s < n; ++s)
      for (const Arc& a : fst->arcs[s]) ++incoming[a.nextstate];
    for (size_t s = 0; s < n; ++s) {
      std::vector<Arc> kept;
      for (const Arc& a : fst->arcs[s]) {
        int32_t d = a.nextstate;
        if (a.ilabel == 0 && a.olabel == 0 &&
            d != static_cast<int32_t>(s) && incoming[d] == 1 &&
            fst->finals[d] == kInf && d != fst->start) {
          for (const Arc& b : fst->arcs[d])
            kept.push_back({b.ilabel, b.olabel, a.weight + b.weight,
                            b.nextstate});
          fst->arcs[d].clear();
          changed = true;
        } else {
          kept.push_back(a);
        }
      }
      fst->arcs[s] = std::move(kept);
    }
  }
  Connect(fst);
}

// ---------------------------------------------------------------------------
// context composition (C ∘ LG)
// ---------------------------------------------------------------------------
// Mirror of old_kaldi_git_tpu/fst/context.py::compose_context (reference
// src/fstext/context-fst.h ComposeContext): expand an LG phone-level FST
// into CLG whose input labels index context windows of N phones, with the
// subsequential '$' flush when N-P-1 > 0.  Disambiguation symbols pass
// through as their own ilabel_info entries [-ordinal].

struct VecHash {
  size_t operator()(const std::vector<int32_t>& v) const {
    size_t h = 1469598103934665603ull;
    for (int32_t x : v) h = (h ^ static_cast<size_t>(x)) * 1099511628211ull;
    return h;
  }
};

struct CtxResult {
  Fst* fst = nullptr;
  std::vector<std::vector<int32_t>> ilabel_info;
  ~CtxResult() { delete fst; }
};

Fst AddSubsequentialLoop(const Fst& in, int32_t subseq) {
  Fst out = in;
  int32_t superfinal = out.AddState();
  out.arcs[superfinal].push_back({subseq, 0, 0.0f, superfinal});
  out.finals[superfinal] = 0.0f;
  for (int32_t s = 0; s + 1 < static_cast<int32_t>(out.NumStates()); ++s) {
    if (out.finals[s] != kInf) {
      out.arcs[s].push_back({subseq, 0, out.finals[s], superfinal});
      out.finals[s] = kInf;
    }
  }
  return out;
}

CtxResult* ComposeContext(const Fst& lg, int N, int P,
                          const int32_t* disambig_ids, int32_t nd,
                          int32_t subseq) {
  auto* res = new CtxResult();
  res->ilabel_info.emplace_back();  // entry 0 = epsilon
  std::unordered_map<std::vector<int32_t>, int32_t, VecHash> window_index;
  std::unordered_map<int32_t, int32_t> disambig_index;
  std::vector<int32_t> sorted_dis(disambig_ids, disambig_ids + nd);
  std::sort(sorted_dis.begin(), sorted_dis.end());
  std::unordered_map<int32_t, int32_t> disambig_ord;
  for (int32_t k = 0; k < nd; ++k) disambig_ord[sorted_dis[k]] = k;

  auto window_label = [&](const std::vector<int32_t>& w) -> int32_t {
    auto it = window_index.find(w);
    if (it != window_index.end()) return it->second;
    res->ilabel_info.push_back(w);
    int32_t id = static_cast<int32_t>(res->ilabel_info.size()) - 1;
    window_index.emplace(w, id);
    return id;
  };
  auto disambig_label = [&](int32_t phone) -> int32_t {
    auto it = disambig_index.find(phone);
    if (it != disambig_index.end()) return it->second;
    res->ilabel_info.push_back({-disambig_ord[phone]});
    int32_t id = static_cast<int32_t>(res->ilabel_info.size()) - 1;
    disambig_index.emplace(phone, id);
    return id;
  };

  if (N == 1) {
    auto* out = new Fst(lg);
    for (auto& row : out->arcs)
      for (Arc& a : row) {
        if (a.ilabel == 0) continue;
        if (disambig_ord.count(a.ilabel))
          a.ilabel = disambig_label(a.ilabel);
        else
          a.ilabel = window_label({a.ilabel});
      }
    res->fst = out;
    return res;
  }

  int delay = N - P - 1;
  if (delay < 0) {
    delete res;
    return nullptr;
  }
  Fst holder;
  const Fst* src = &lg;
  if (delay > 0) {
    holder = AddSubsequentialLoop(lg, subseq);
    src = &holder;
  }

  auto* out = new Fst();
  res->fst = out;
  // state key: [hist(N-1 phones, 0-padded), lg_state]
  std::unordered_map<std::vector<int32_t>, int32_t, VecHash> ids;
  std::vector<int32_t> start_key(N, 0);
  start_key[N - 1] = src->start;
  ids[start_key] = out->AddState();
  out->start = 0;
  std::vector<std::vector<int32_t>> stack{start_key};
  std::vector<int32_t> full(N);
  while (!stack.empty()) {
    std::vector<int32_t> key = std::move(stack.back());
    stack.pop_back();
    int32_t q = key[N - 1];
    int32_t s_out = ids[key];
    if (src->finals[q] != kInf) out->finals[s_out] = src->finals[q];

    for (const Arc& a : src->arcs[q]) {
      int32_t ilabel;
      std::vector<int32_t> nkey;
      if (a.ilabel == 0) {
        ilabel = 0;
        nkey = key;
        nkey[N - 1] = a.nextstate;
      } else if (disambig_ord.count(a.ilabel)) {
        ilabel = disambig_label(a.ilabel);
        nkey = key;
        nkey[N - 1] = a.nextstate;
      } else {
        int32_t phone = a.ilabel == subseq ? 0 : a.ilabel;
        for (int i = 0; i + 1 < N; ++i) full[i] = key[i];
        full[N - 1] = phone;
        int32_t center = full[P];
        nkey.assign(full.begin() + 1, full.end());
        nkey.push_back(a.nextstate);
        ilabel = center == 0 ? 0 : window_label(full);
      }
      auto it = ids.find(nkey);
      if (it == ids.end()) {
        it = ids.emplace(nkey, out->AddState()).first;
        stack.push_back(nkey);
      }
      out->arcs[s_out].push_back({ilabel, a.olabel, a.weight, it->second});
    }
  }
  Connect(out);
  return res;
}

// ---------------------------------------------------------------------------
// add-self-loops (reorder semantics)
// ---------------------------------------------------------------------------
// Mirror of old_kaldi_git_tpu/hmm/hmm_utils.py::add_self_loops: weight
// correction on forward arcs, state splitting so all incoming arcs share
// one transition-state class, loop arcs keyed by incoming class.
// Per-tid data comes as arrays (the TransitionModel stays in Python):
//   tid_tstate[num_tids+1]: transition-state per tid (index 0 unused)
//   ts_self_tid[num_ts+1]:  self-loop tid per tstate (0 = none)
//   ts_loop_w / ts_fwd_w:   loop-arc weight / forward-arc correction
// ilabels > num_tids are disambig pass-throughs (class 0), as assigned by
// make_h_transducer.

Fst* AddSelfLoops(const Fst& in, const int32_t* tid_tstate, int32_t num_tids,
                  const int32_t* ts_self_tid, const float* ts_loop_w,
                  const float* ts_fwd_w, int32_t num_ts) {
  auto* out = new Fst(in);
  auto arc_class = [&](const Arc& a) -> int32_t {
    if (a.ilabel <= 0 || a.ilabel > num_tids) return 0;
    return tid_tstate[a.ilabel] + 1;
  };
  // 1. forward-arc weight correction
  for (auto& row : out->arcs)
    for (Arc& a : row)
      if (a.ilabel > 0 && a.ilabel <= num_tids)
        a.weight += ts_fwd_w[tid_tstate[a.ilabel]];

  // 2. split states with mixed incoming classes
  size_t num_orig = out->NumStates();
  std::vector<std::vector<int32_t>> incoming(num_orig);
  for (auto& row : out->arcs)
    for (const Arc& a : row) {
      auto& v = incoming[a.nextstate];
      int32_t c = arc_class(a);
      if (std::find(v.begin(), v.end(), c) == v.end()) v.push_back(c);
    }
  // copies[(s, class)] -> state id; encode key as s * (num_ts + 2) + class
  std::unordered_map<int64_t, int32_t> copies;
  int64_t stride = static_cast<int64_t>(num_ts) + 2;
  std::vector<int32_t> state_class;  // class per state (post-split)
  state_class.assign(num_orig, 0);
  for (size_t s = 0; s < num_orig; ++s) {
    auto classes = incoming[s];
    std::sort(classes.begin(), classes.end());
    if (classes.empty()) {
      copies[static_cast<int64_t>(s) * stride + 0] = static_cast<int32_t>(s);
      continue;
    }
    copies[static_cast<int64_t>(s) * stride + classes[0]] =
        static_cast<int32_t>(s);
    state_class[s] = classes[0];
    for (size_t i = 1; i < classes.size(); ++i) {
      int32_t ns = out->AddState();
      copies[static_cast<int64_t>(s) * stride + classes[i]] = ns;
      out->arcs[ns] = out->arcs[s];
      out->finals[ns] = out->finals[s];
      state_class.push_back(classes[i]);
    }
  }
  for (auto& row : out->arcs)
    for (Arc& a : row) {
      auto it = copies.find(static_cast<int64_t>(a.nextstate) * stride +
                            arc_class(a));
      if (it != copies.end()) a.nextstate = it->second;
    }

  // 3. loop arcs keyed by incoming class
  for (size_t s = 0; s < out->NumStates(); ++s) {
    int32_t c = state_class[s];
    if (c == 0) continue;
    int32_t ts = c - 1;
    int32_t loop_tid = ts_self_tid[ts];
    if (loop_tid)
      out->arcs[s].push_back(
          {loop_tid, 0, ts_loop_w[ts], static_cast<int32_t>(s)});
  }
  return out;
}

// ---------------------------------------------------------------------------
// push-special (power iteration in the probability domain)
// ---------------------------------------------------------------------------
// Mirror of old_kaldi_git_tpu/fst/algorithms.py::push_special (reference
// src/fstext/push-special.cc): reweight in place so every state's total
// outflow is one constant, preserving path weights up to a global constant.

void PushSpecial(Fst* fst, double delta, int max_iters) {
  size_t n = fst->NumStates();
  if (n == 0) return;
  std::vector<double> x(n, 1.0), nx(n);
  for (int iter = 0; iter < max_iters; ++iter) {
    for (size_t s = 0; s < n; ++s) {
      double acc = 0.0;
      for (const Arc& a : fst->arcs[s])
        acc += std::exp(-static_cast<double>(a.weight)) * x[a.nextstate];
      if (fst->finals[s] != kInf)
        acc += std::exp(-static_cast<double>(fst->finals[s]));
      nx[s] = acc;
    }
    double norm = 0.0;
    for (double v : nx) norm += v;
    norm /= n;
    if (norm <= 0) return;
    double diff = 0.0;
    for (size_t s = 0; s < n; ++s) {
      nx[s] /= norm;
      diff = std::max(diff, std::fabs(nx[s] - x[s]));
    }
    std::swap(x, nx);
    if (diff < delta) break;
  }
  std::vector<double> logx(n);
  for (size_t s = 0; s < n; ++s) logx[s] = std::log(std::max(x[s], 1e-30));
  for (size_t s = 0; s < n; ++s) {
    for (Arc& a : fst->arcs[s])
      a.weight = static_cast<float>(a.weight + logx[s] - logx[a.nextstate]);
    if (fst->finals[s] != kInf)
      fst->finals[s] = static_cast<float>(fst->finals[s] + logx[s]);
  }
}

// ---------------------------------------------------------------------------
// eps-forwarded CSR export (decoder graph form)
// ---------------------------------------------------------------------------
// Mirror of old_kaldi_git_tpu/decoder/csr.py::fst_to_csr: per-state Dijkstra
// over eps-input arcs, emitting { eps-closure ∘ emitting arc } with closure
// weights folded in and output labels collected along the argmin path.

struct CsrResult {
  int32_t start = 0;
  std::vector<int32_t> row_ptr, tid, nextstate;
  std::vector<float> weight;
  std::vector<float> final_weight;          // kInf = not final
  std::vector<int32_t> olab_off, olab_val;  // per-arc olabel runs
  std::vector<int32_t> folab_off, folab_val;  // per-state final olabel runs
};

CsrResult* FstToCsr(const Fst& fst) {
  auto* res = new CsrResult();
  res->start = fst.start;
  size_t S = fst.NumStates();
  res->row_ptr.assign(S + 1, 0);
  res->final_weight.assign(S, kInf);
  res->folab_off.assign(S + 1, 0);
  res->olab_off.push_back(0);

  // olabel strings interned in a prefix tree (same trick as the
  // determinizer) so closure paths share storage
  StringTable strings;
  // scratch, reused per state
  std::unordered_map<int32_t, double> dist;
  std::unordered_map<int32_t, int32_t> lab;
  using QItem = std::pair<double, int32_t>;
  std::priority_queue<QItem, std::vector<QItem>, std::greater<QItem>> heap;
  struct OutArc {
    int64_t key;  // (ilabel << 32) | nextstate, for sorted dedup
    float w;
    int32_t str;
  };
  std::unordered_map<int64_t, std::pair<float, int32_t>> arcs_out;

  for (size_t s = 0; s < S; ++s) {
    dist.clear();
    lab.clear();
    arcs_out.clear();
    dist[s] = 0.0;
    lab[s] = 0;
    heap.push({0.0, static_cast<int32_t>(s)});
    double best_final = kInf;
    int32_t best_final_lab = 0;
    while (!heap.empty()) {
      auto [d, u] = heap.top();
      heap.pop();
      if (d > dist[u] + 1e-12) continue;
      for (const Arc& a : fst.arcs[u]) {
        if (a.ilabel != 0) continue;
        double ndist = d + a.weight;
        auto it = dist.find(a.nextstate);
        if (it == dist.end() || ndist < it->second - 1e-12) {
          dist[a.nextstate] = ndist;
          int32_t nl = lab[u];
          if (a.olabel != 0) nl = strings.Append(nl, a.olabel);
          lab[a.nextstate] = nl;
          heap.push({ndist, a.nextstate});
        }
      }
    }
    for (const auto& [u, w_eps] : dist) {
      int32_t olab = lab[u];
      if (fst.finals[u] != kInf && w_eps + fst.finals[u] < best_final) {
        best_final = w_eps + fst.finals[u];
        best_final_lab = olab;
      }
      for (const Arc& a : fst.arcs[u]) {
        if (a.ilabel == 0) continue;
        float w = static_cast<float>(w_eps + a.weight);
        int64_t key =
            (static_cast<int64_t>(a.ilabel) << 32) | a.nextstate;
        auto it = arcs_out.find(key);
        if (it == arcs_out.end() || w < it->second.first) {
          int32_t labs =
              a.olabel == 0 ? olab : strings.Append(olab, a.olabel);
          arcs_out[key] = {w, labs};
        }
      }
    }
    // sorted by (ilabel, nextstate) to match the Python implementation
    std::vector<std::pair<int64_t, std::pair<float, int32_t>>> sorted_arcs(
        arcs_out.begin(), arcs_out.end());
    std::sort(sorted_arcs.begin(), sorted_arcs.end(),
              [](const auto& a, const auto& b) { return a.first < b.first; });
    for (const auto& [key, val] : sorted_arcs) {
      res->tid.push_back(static_cast<int32_t>(key >> 32));
      res->nextstate.push_back(static_cast<int32_t>(key & 0xffffffff));
      res->weight.push_back(val.first);
      std::vector<int32_t> labels = strings.Expand(val.second);
      for (int32_t l : labels) res->olab_val.push_back(l);
      res->olab_off.push_back(static_cast<int32_t>(res->olab_val.size()));
    }
    res->row_ptr[s + 1] = static_cast<int32_t>(res->tid.size());
    if (best_final != kInf) {
      res->final_weight[s] = static_cast<float>(best_final);
      std::vector<int32_t> labels = strings.Expand(best_final_lab);
      for (int32_t l : labels) res->folab_val.push_back(l);
    }
    res->folab_off[s + 1] = static_cast<int32_t>(res->folab_val.size());
  }
  return res;
}

}  // namespace

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------

extern "C" {

void* okt_fst_create(int32_t num_states, int32_t start,
                     const int32_t* row_ptr, const int32_t* ilabels,
                     const int32_t* olabels, const float* weights,
                     const int32_t* nextstates, const float* finals) {
  auto* fst = new Fst();
  fst->arcs.resize(num_states);
  fst->finals.assign(finals, finals + num_states);
  fst->start = start;
  for (int32_t s = 0; s < num_states; ++s)
    for (int32_t i = row_ptr[s]; i < row_ptr[s + 1]; ++i)
      fst->arcs[s].push_back(
          {ilabels[i], olabels[i], weights[i], nextstates[i]});
  return fst;
}

void okt_fst_destroy(void* h) { delete static_cast<Fst*>(h); }

int32_t okt_fst_num_states(void* h) {
  return static_cast<int32_t>(static_cast<Fst*>(h)->NumStates());
}
int64_t okt_fst_num_arcs(void* h) {
  return static_cast<int64_t>(static_cast<Fst*>(h)->NumArcs());
}
int32_t okt_fst_start(void* h) { return static_cast<Fst*>(h)->start; }

void okt_fst_export(void* h, int32_t* row_ptr, int32_t* ilabels,
                    int32_t* olabels, float* weights, int32_t* nextstates,
                    float* finals) {
  Fst* fst = static_cast<Fst*>(h);
  int64_t idx = 0;
  row_ptr[0] = 0;
  for (size_t s = 0; s < fst->NumStates(); ++s) {
    for (const Arc& a : fst->arcs[s]) {
      ilabels[idx] = a.ilabel;
      olabels[idx] = a.olabel;
      weights[idx] = a.weight;
      nextstates[idx] = a.nextstate;
      ++idx;
    }
    row_ptr[s + 1] = static_cast<int32_t>(idx);
    finals[s] = fst->finals[s];
  }
}

void* okt_compose(void* a, void* b) {
  return Compose(*static_cast<Fst*>(a), *static_cast<Fst*>(b));
}

void* okt_determinize_star(void* h, int use_log, int64_t max_states) {
  try {
    Determinizer det(*static_cast<Fst*>(h), use_log != 0, max_states);
    return det.Run();
  } catch (const std::exception&) {
    return nullptr;
  }
}

void* okt_minimize_encoded(void* h) {
  return MinimizeEncoded(*static_cast<Fst*>(h));
}

void okt_remove_eps_local(void* h) { RemoveEpsLocal(static_cast<Fst*>(h)); }

void okt_connect(void* h) { Connect(static_cast<Fst*>(h)); }

// --- context composition ---

void* okt_compose_context(void* lg, int32_t N, int32_t P,
                          const int32_t* disambig, int32_t nd,
                          int32_t subseq) {
  try {
    return ComposeContext(*static_cast<Fst*>(lg), N, P, disambig, nd, subseq);
  } catch (const std::exception&) {
    return nullptr;
  }
}

int32_t okt_ctx_num_ilabels(void* r) {
  return static_cast<int32_t>(static_cast<CtxResult*>(r)->ilabel_info.size());
}

int64_t okt_ctx_info_total(void* r) {
  int64_t total = 0;
  for (const auto& v : static_cast<CtxResult*>(r)->ilabel_info)
    total += static_cast<int64_t>(v.size());
  return total;
}

void okt_ctx_export_info(void* r, int32_t* offsets, int32_t* values) {
  auto* res = static_cast<CtxResult*>(r);
  int64_t idx = 0;
  offsets[0] = 0;
  for (size_t i = 0; i < res->ilabel_info.size(); ++i) {
    for (int32_t v : res->ilabel_info[i]) values[idx++] = v;
    offsets[i + 1] = static_cast<int32_t>(idx);
  }
}

void* okt_ctx_take_fst(void* r) {
  auto* res = static_cast<CtxResult*>(r);
  Fst* fst = res->fst;
  res->fst = nullptr;
  return fst;
}

void okt_ctx_destroy(void* r) { delete static_cast<CtxResult*>(r); }

// --- add-self-loops / push-special / rm-symbols ---

void* okt_add_self_loops(void* h, const int32_t* tid_tstate, int32_t num_tids,
                         const int32_t* ts_self_tid, const float* ts_loop_w,
                         const float* ts_fwd_w, int32_t num_ts) {
  return AddSelfLoops(*static_cast<Fst*>(h), tid_tstate, num_tids,
                      ts_self_tid, ts_loop_w, ts_fwd_w, num_ts);
}

void okt_push_special(void* h, float delta, int32_t max_iters) {
  PushSpecial(static_cast<Fst*>(h), delta, max_iters);
}

void okt_rm_symbols(void* h, const int32_t* labels, int32_t n, int32_t side) {
  Fst* fst = static_cast<Fst*>(h);
  std::vector<int32_t> sorted(labels, labels + n);
  std::sort(sorted.begin(), sorted.end());
  for (auto& row : fst->arcs)
    for (Arc& a : row) {
      int32_t l = side == 0 ? a.ilabel : a.olabel;
      if (std::binary_search(sorted.begin(), sorted.end(), l)) {
        if (side == 0)
          a.ilabel = 0;
        else
          a.olabel = 0;
      }
    }
}

// --- eps-forwarded CSR export ---

void* okt_fst_to_csr(void* h) {
  try {
    return FstToCsr(*static_cast<Fst*>(h));
  } catch (const std::exception&) {
    return nullptr;
  }
}

void okt_csr_sizes(void* r, int32_t* out /* [5]: S, A, olab, folab, start */) {
  auto* res = static_cast<CsrResult*>(r);
  out[0] = static_cast<int32_t>(res->final_weight.size());
  out[1] = static_cast<int32_t>(res->tid.size());
  out[2] = static_cast<int32_t>(res->olab_val.size());
  out[3] = static_cast<int32_t>(res->folab_val.size());
  out[4] = res->start;
}

void okt_csr_export(void* r, int32_t* row_ptr, int32_t* tid, float* weight,
                    int32_t* nextstate, float* final_weight,
                    int32_t* olab_off, int32_t* olab_val, int32_t* folab_off,
                    int32_t* folab_val) {
  auto* res = static_cast<CsrResult*>(r);
  std::memcpy(row_ptr, res->row_ptr.data(),
              res->row_ptr.size() * sizeof(int32_t));
  std::memcpy(tid, res->tid.data(), res->tid.size() * sizeof(int32_t));
  std::memcpy(weight, res->weight.data(), res->weight.size() * sizeof(float));
  std::memcpy(nextstate, res->nextstate.data(),
              res->nextstate.size() * sizeof(int32_t));
  std::memcpy(final_weight, res->final_weight.data(),
              res->final_weight.size() * sizeof(float));
  std::memcpy(olab_off, res->olab_off.data(),
              res->olab_off.size() * sizeof(int32_t));
  if (!res->olab_val.empty())
    std::memcpy(olab_val, res->olab_val.data(),
                res->olab_val.size() * sizeof(int32_t));
  std::memcpy(folab_off, res->folab_off.data(),
              res->folab_off.size() * sizeof(int32_t));
  if (!res->folab_val.empty())
    std::memcpy(folab_val, res->folab_val.data(),
                res->folab_val.size() * sizeof(int32_t));
}

void okt_csr_destroy(void* r) { delete static_cast<CsrResult*>(r); }

}  // extern "C"
