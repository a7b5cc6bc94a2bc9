// Native pruned lattice determinization (CompactLattice).
//
// C++ mirror of old_kaldi_git_tpu/lat/determinize.py — the post-decode CPU
// hotspot the reference also keeps native (src/lat/
// determinize-lattice-pruned.cc, SURVEY.md §7.3/§7.4).  Same algorithm:
// weighted subset determinization in the (LatticeWeight, tid-string)
// semiring with common-divisor normalization, beta-cost pruning and
// forward-cost re-expansion; equivalence-tested against the Python
// implementation on random lattices (tests/test_determinize.py native
// cases).
//
// C ABI (okt_lat_*) consumed via ctypes from old_kaldi_git_tpu/lat/native.py.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <map>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

constexpr float kInf = std::numeric_limits<float>::infinity();

struct InArc {
  int32_t ilabel, olabel, nextstate;
  float g, a;
};

struct Weight {
  double g = 0.0, a = 0.0;
};

inline bool WKeyLess(const Weight& x, const Weight& y) {
  double tx = x.g + x.a, ty = y.g + y.a;
  if (tx != ty) return tx < ty;
  return x.g < y.g;
}

using Str = std::vector<int32_t>;

inline bool PairLess(const Weight& wx, const Str& sx, const Weight& wy,
                     const Str& sy) {
  if (WKeyLess(wx, wy)) return true;
  if (WKeyLess(wy, wx)) return false;
  return sx < sy;
}

inline double Round6(double v) { return std::round(v * 1e6) / 1e6; }

struct ClatArc {
  int32_t word;
  float g, a;
  Str tids;
  int32_t nextstate;
};

struct Clat {
  std::vector<std::vector<ClatArc>> arcs;
  std::vector<float> fin_g, fin_a;
  std::vector<Str> fin_tids;
  int32_t start = 0;
  int32_t AddState() {
    arcs.emplace_back();
    fin_g.push_back(kInf);
    fin_a.push_back(kInf);
    fin_tids.emplace_back();
    return static_cast<int32_t>(arcs.size()) - 1;
  }
};

// element of a (possibly unnormalized) subset
struct Elem {
  Weight w;
  Str s;
};

struct Determinizer {
  int32_t S;
  int32_t start;
  std::vector<std::vector<InArc>> arcs;   // outgoing, by state
  std::vector<float> final_g, final_a;
  double beam;
  int64_t max_states, max_arcs;

  std::vector<int32_t> order, topo_index;
  std::vector<double> beta;
  double cutoff = 0;
  bool pruning = false;

  Clat out;
  // subset key -> det state id
  std::unordered_map<std::string, int32_t> ids;
  std::vector<double> forward;
  std::vector<std::pair<int32_t, std::string>> agenda;
  // keep each det state's canonical subset for (re-)expansion
  std::vector<std::vector<std::pair<int32_t, Elem>>> subsets;

  bool TopoSort() {
    std::vector<int32_t> indeg(S, 0);
    for (int32_t s = 0; s < S; ++s)
      for (const auto& a : arcs[s]) indeg[a.nextstate]++;
    for (int32_t s = 0; s < S; ++s)
      if (indeg[s] == 0) order.push_back(s);
    for (size_t i = 0; i < order.size(); ++i)
      for (const auto& a : arcs[order[i]])
        if (--indeg[a.nextstate] == 0) order.push_back(a.nextstate);
    if (static_cast<int32_t>(order.size()) != S) return false;
    topo_index.assign(S, 0);
    for (size_t i = 0; i < order.size(); ++i) topo_index[order[i]] = i;
    return true;
  }

  void Backward() {
    beta.assign(S, kInf);
    for (int32_t s = 0; s < S; ++s)
      if (final_g[s] != kInf) beta[s] = final_g[s] + final_a[s];
    for (auto it = order.rbegin(); it != order.rend(); ++it) {
      int32_t s = *it;
      for (const auto& a : arcs[s]) {
        double c = a.g + a.a + beta[a.nextstate];
        if (c < beta[s]) beta[s] = c;
      }
    }
  }

  // epsilon (olabel==0) closure over a state→Elem map, combined by the
  // (weight-key, string) order; input lattices are acyclic
  void EpsClosure(std::map<int32_t, Elem>* elems) {
    std::vector<int32_t> ag;
    for (const auto& kv : *elems) ag.push_back(kv.first);
    std::sort(ag.begin(), ag.end(),
              [&](int32_t x, int32_t y) { return topo_index[x] < topo_index[y]; });
    for (size_t i = 0; i < ag.size(); ++i) {
      int32_t s = ag[i];
      Elem cur = (*elems)[s];
      for (const auto& a : arcs[s]) {
        if (a.olabel != 0) continue;
        Elem ne;
        ne.w.g = cur.w.g + a.g;
        ne.w.a = cur.w.a + a.a;
        ne.s = cur.s;
        if (a.ilabel) ne.s.push_back(a.ilabel);
        auto it = elems->find(a.nextstate);
        if (it == elems->end() ||
            PairLess(ne.w, ne.s, it->second.w, it->second.s)) {
          (*elems)[a.nextstate] = ne;
          if (it == elems->end()) {
            // insert keeping topo order
            int32_t ti = topo_index[a.nextstate];
            auto pos = std::lower_bound(
                ag.begin() + i + 1, ag.end(), ti,
                [&](int32_t x, int32_t t) { return topo_index[x] < t; });
            ag.insert(pos, a.nextstate);
          }
        }
      }
    }
  }

  void Prune(std::map<int32_t, Elem>* elems, double fwd) {
    if (!pruning) return;
    for (auto it = elems->begin(); it != elems->end();) {
      double tot = fwd + it->second.w.g + it->second.w.a + beta[it->first];
      if (tot > cutoff + 1e-6)
        it = elems->erase(it);
      else
        ++it;
    }
  }

  // divisor + canonical residual key; residuals left in *elems
  void Normalize(std::map<int32_t, Elem>* elems, Weight* div_w, Str* div_s,
                 std::string* key,
                 std::vector<std::pair<int32_t, Elem>>* resid) {
    bool first = true;
    for (const auto& kv : *elems) {
      if (first || WKeyLess(kv.second.w, *div_w)) {
        *div_w = kv.second.w;
        first = false;
      }
    }
    bool sfirst = true;
    for (const auto& kv : *elems) {
      if (sfirst) {
        *div_s = kv.second.s;
        sfirst = false;
      } else {
        size_t n = 0;
        while (n < div_s->size() && n < kv.second.s.size() &&
               (*div_s)[n] == kv.second.s[n])
          ++n;
        div_s->resize(n);
      }
    }
    resid->clear();
    key->clear();
    for (const auto& kv : *elems) {
      Elem e;
      e.w.g = Round6(kv.second.w.g - div_w->g);
      e.w.a = Round6(kv.second.w.a - div_w->a);
      e.s.assign(kv.second.s.begin() + div_s->size(), kv.second.s.end());
      resid->emplace_back(kv.first, e);
      // serialize into the key
      int32_t st = kv.first;
      key->append(reinterpret_cast<const char*>(&st), 4);
      double wg = e.w.g, wa = e.w.a;
      key->append(reinterpret_cast<const char*>(&wg), 8);
      key->append(reinterpret_cast<const char*>(&wa), 8);
      int32_t len = e.s.size();
      key->append(reinterpret_cast<const char*>(&len), 4);
      if (len)
        key->append(reinterpret_cast<const char*>(e.s.data()), 4l * len);
    }
  }

  // returns false on blow-up
  bool Run() {
    if (!TopoSort()) return false;
    Backward();
    if (beta[start] == kInf) return true;  // empty result
    cutoff = beta[start] + beam;

    std::map<int32_t, Elem> init;
    init[start] = Elem{};
    EpsClosure(&init);
    Prune(&init, 0.0);
    // the start state keeps full weights (no incoming arc for a divisor)
    std::vector<std::pair<int32_t, Elem>> resid;
    std::string key;
    for (const auto& kv : init) {
      int32_t st = kv.first;
      Elem e = kv.second;
      e.w.g = Round6(e.w.g);
      e.w.a = Round6(e.w.a);
      key.append(reinterpret_cast<const char*>(&st), 4);
      double wg = e.w.g, wa = e.w.a;
      key.append(reinterpret_cast<const char*>(&wg), 8);
      key.append(reinterpret_cast<const char*>(&wa), 8);
      int32_t len = e.s.size();
      key.append(reinterpret_cast<const char*>(&len), 4);
      if (len) key.append(reinterpret_cast<const char*>(e.s.data()), 4l * len);
      resid.emplace_back(st, e);
    }
    int32_t st0 = out.AddState();
    out.start = st0;
    ids[key] = st0;
    forward.push_back(0.0);
    subsets.push_back(resid);
    agenda.emplace_back(st0, key);

    int64_t total_arcs = 0;
    while (!agenda.empty()) {
      auto [det_s, k] = agenda.back();
      agenda.pop_back();
      double fwd = forward[det_s];
      // re-expansion replaces this state's arcs: uncount them so the
      // max_arcs guard tracks actual arcs (as the Python mirror does)
      total_arcs -= static_cast<int64_t>(out.arcs[det_s].size());
      out.arcs[det_s].clear();
      out.fin_g[det_s] = kInf;
      out.fin_a[det_s] = kInf;
      out.fin_tids[det_s].clear();
      const auto subset = subsets[det_s];

      // final weight
      bool have_fin = false;
      Weight fin_w;
      Str fin_s;
      for (const auto& kv : subset) {
        if (final_g[kv.first] == kInf) continue;
        Weight fw;
        fw.g = kv.second.w.g + final_g[kv.first];
        fw.a = kv.second.w.a + final_a[kv.first];
        if (!have_fin || PairLess(fw, kv.second.s, fin_w, fin_s)) {
          fin_w = fw;
          fin_s = kv.second.s;
          have_fin = true;
        }
      }
      if (have_fin) {
        out.fin_g[det_s] = fin_w.g;
        out.fin_a[det_s] = fin_w.a;
        out.fin_tids[det_s] = fin_s;
      }

      // group outgoing non-eps arcs by word
      std::map<int32_t, std::map<int32_t, Elem>> by_label;
      for (const auto& kv : subset) {
        for (const auto& a : arcs[kv.first]) {
          if (a.olabel == 0) continue;
          Elem ne;
          ne.w.g = kv.second.w.g + a.g;
          ne.w.a = kv.second.w.a + a.a;
          ne.s = kv.second.s;
          if (a.ilabel) ne.s.push_back(a.ilabel);
          auto& d = by_label[a.olabel];
          auto it = d.find(a.nextstate);
          if (it == d.end() ||
              PairLess(ne.w, ne.s, it->second.w, it->second.s))
            d[a.nextstate] = ne;
        }
      }
      for (auto& [word, nxt] : by_label) {
        EpsClosure(&nxt);
        Prune(&nxt, fwd);
        if (nxt.empty()) continue;
        Weight div_w;
        Str div_s;
        std::string nkey;
        std::vector<std::pair<int32_t, Elem>> nresid;
        Normalize(&nxt, &div_w, &div_s, &nkey, &nresid);
        double nfwd = fwd + div_w.g + div_w.a;
        int32_t ns_id;
        auto it = ids.find(nkey);
        if (it != ids.end()) {
          ns_id = it->second;
          if (nfwd < forward[ns_id] - 1e-9) {
            forward[ns_id] = nfwd;
            agenda.emplace_back(ns_id, nkey);
          }
        } else {
          ns_id = out.AddState();
          if (static_cast<int64_t>(out.arcs.size()) > max_states) return false;
          ids[nkey] = ns_id;
          forward.push_back(nfwd);
          subsets.push_back(nresid);
          agenda.emplace_back(ns_id, nkey);
        }
        ClatArc arc;
        arc.word = word;
        arc.g = div_w.g;
        arc.a = div_w.a;
        arc.tids = div_s;
        arc.nextstate = ns_id;
        out.arcs[det_s].push_back(std::move(arc));
        if (++total_arcs > max_arcs) return false;
      }
    }
    return true;
  }
};

}  // namespace

extern "C" {

void* okt_lat_determinize(int32_t num_states, int32_t start, int64_t num_arcs,
                          const int32_t* from, const int32_t* to,
                          const int32_t* ilab, const int32_t* olab,
                          const float* graph_cost, const float* ac_cost,
                          const float* final_g, const float* final_a,
                          float beam, int64_t max_states, int64_t max_arcs) {
  auto* d = new Determinizer();
  d->S = num_states;
  d->start = start;
  d->arcs.resize(num_states);
  for (int64_t i = 0; i < num_arcs; ++i) {
    InArc a;
    a.ilabel = ilab[i];
    a.olabel = olab[i];
    a.nextstate = to[i];
    a.g = graph_cost[i];
    a.a = ac_cost[i];
    d->arcs[from[i]].push_back(a);
  }
  d->final_g.assign(final_g, final_g + num_states);
  d->final_a.assign(final_a, final_a + num_states);
  d->pruning = std::isfinite(beam);
  d->beam = beam;
  d->max_states = max_states;
  d->max_arcs = max_arcs;
  if (!d->Run()) {
    delete d;
    return nullptr;
  }
  return d;
}

void okt_lat_sizes(void* h, int32_t* num_states, int64_t* num_arcs,
                   int64_t* num_arc_tids, int64_t* num_fin_tids,
                   int32_t* start) {
  auto* d = static_cast<Determinizer*>(h);
  *num_states = d->out.arcs.size();
  int64_t na = 0, nt = 0, nf = 0;
  for (const auto& lst : d->out.arcs)
    for (const auto& a : lst) {
      na++;
      nt += a.tids.size();
    }
  for (const auto& s : d->out.fin_tids) nf += s.size();
  *num_arcs = na;
  *num_arc_tids = nt;
  *num_fin_tids = nf;
  *start = d->out.start;
}

void okt_lat_export(void* h, int32_t* arc_from, int32_t* arc_to,
                    int32_t* arc_word, float* arc_g, float* arc_a,
                    int64_t* arc_tid_off, int32_t* arc_tids, float* fin_g,
                    float* fin_a, int64_t* fin_tid_off, int32_t* fin_tids) {
  auto* d = static_cast<Determinizer*>(h);
  int64_t ai = 0, ti = 0;
  for (size_t s = 0; s < d->out.arcs.size(); ++s) {
    for (const auto& a : d->out.arcs[s]) {
      arc_from[ai] = s;
      arc_to[ai] = a.nextstate;
      arc_word[ai] = a.word;
      arc_g[ai] = a.g;
      arc_a[ai] = a.a;
      arc_tid_off[ai] = ti;
      for (int32_t t : a.tids) arc_tids[ti++] = t;
      ai++;
    }
  }
  arc_tid_off[ai] = ti;
  int64_t fi = 0;
  for (size_t s = 0; s < d->out.arcs.size(); ++s) {
    fin_g[s] = d->out.fin_g[s];
    fin_a[s] = d->out.fin_a[s];
    fin_tid_off[s] = fi;
    for (int32_t t : d->out.fin_tids[s]) fin_tids[fi++] = t;
  }
  fin_tid_off[d->out.arcs.size()] = fi;
}

void okt_lat_destroy(void* h) { delete static_cast<Determinizer*>(h); }

}  // extern "C"
