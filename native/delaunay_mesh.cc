// Visibility-driven 3D surface reconstruction (OpenMVS ReconstructMesh
// equivalent — reference wrapper /root/reference/mesh/createmesh.py:50-79):
//
//   1. 3D Delaunay tetrahedralization of the fused points
//      (incremental Bowyer-Watson, double precision, walk point location)
//   2. s-t graph over tetrahedra: for every (camera, point) visibility pair
//      the segment camera->point votes "free space" on the cells it
//      crosses, and the cell just behind the point votes "inside"
//      (OpenMVS-style alpha_vis weights with a t-link at the ends)
//   3. min-cut (BFS/Dinic) labels cells inside/outside; the surface is the
//      facets between differently-labeled cells, oriented outward
//   4. cleanup: drop small connected components (spurious), optional
//      quality decimation is left to the caller
//
// C API (ctypes): d3d_reconstruct_mesh(...) fills malloc'd buffers;
// d3d_free releases them. See utils/native.py for the Python side.

#include <algorithm>
#include <cstdio>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <queue>
#include <random>
#include <unordered_map>
#include <vector>

namespace {

struct V3 {
  double x, y, z;
};
static inline V3 sub(const V3 &a, const V3 &b) {
  return {a.x - b.x, a.y - b.y, a.z - b.z};
}
static inline V3 cross(const V3 &a, const V3 &b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z,
          a.x * b.y - a.y * b.x};
}
static inline double dot(const V3 &a, const V3 &b) {
  return a.x * b.x + a.y * b.y + a.z * b.z;
}

// orient3d > 0 iff d is on the +side of plane (a,b,c) (right-handed)
static inline double orient3d(const V3 &a, const V3 &b, const V3 &c,
                              const V3 &d) {
  return dot(cross(sub(b, a), sub(c, a)), sub(d, a));
}

// insphere: > 0 iff e inside circumsphere of positively-oriented (a,b,c,d)
static double insphere(const V3 &a, const V3 &b, const V3 &c, const V3 &d,
                       const V3 &e) {
  auto lift = [&](const V3 &p, double out[4]) {
    out[0] = p.x - e.x;
    out[1] = p.y - e.y;
    out[2] = p.z - e.z;
    out[3] = out[0] * out[0] + out[1] * out[1] + out[2] * out[2];
  };
  double m[4][4];
  lift(a, m[0]);
  lift(b, m[1]);
  lift(c, m[2]);
  lift(d, m[3]);
  auto det3 = [](double a0, double a1, double a2, double b0, double b1,
                 double b2, double c0, double c1, double c2) {
    return a0 * (b1 * c2 - b2 * c1) - a1 * (b0 * c2 - b2 * c0) +
           a2 * (b0 * c1 - b1 * c0);
  };
  double det = 0;
  for (int i = 0; i < 4; i++) {
    int r[3], k = 0;
    for (int j = 0; j < 4; j++)
      if (j != i) r[k++] = j;
    double d3 = det3(m[r[0]][0], m[r[0]][1], m[r[0]][2], m[r[1]][0],
                     m[r[1]][1], m[r[1]][2], m[r[2]][0], m[r[2]][1],
                     m[r[2]][2]);
    det += ((i % 2) ? -1.0 : 1.0) * m[i][3] * d3;
  }
  return det;  // sign convention checked against orientation by caller
}

// tetrahedron: 4 vertex ids, 4 neighbors (opposite each vertex)
struct Tet {
  int v[4];
  int nb[4];  // neighbor tet index across face opposite v[i]; -1 = none
  bool alive = true;
};

static const int kFace[4][3] = {{1, 3, 2}, {0, 2, 3}, {0, 3, 1}, {0, 1, 2}};
// kFace[i] = face opposite vertex i, oriented so that (face, v[i]) is
// positively oriented (v[i] on + side).

struct Delaunay {
  std::vector<V3> pts;  // input points + 4 super vertices at the end
  std::vector<Tet> tets;
  std::vector<int> incident;  // an (alive at build end) tet per input point
  int n_input = 0;

  bool positively(const Tet &t, const V3 &p, int face, double eps) const {
    const V3 &a = pts[t.v[kFace[face][0]]];
    const V3 &b = pts[t.v[kFace[face][1]]];
    const V3 &c = pts[t.v[kFace[face][2]]];
    return orient3d(a, b, c, p) > -eps;
  }

  // walk from tet `start` toward p; returns containing tet or -1
  int locate(int start, const V3 &p, double eps) const {
    int cur = start;
    int steps = 0;
    int limit = (int)tets.size() * 2 + 64;
    while (cur >= 0 && steps++ < limit) {
      if (!tets[cur].alive) {
        cur = -1;
        break;
      }
      const Tet &t = tets[cur];
      int next = -1;
      for (int f = 0; f < 4; f++) {
        const V3 &a = pts[t.v[kFace[f][0]]];
        const V3 &b = pts[t.v[kFace[f][1]]];
        const V3 &c = pts[t.v[kFace[f][2]]];
        if (orient3d(a, b, c, p) < -eps) {
          next = t.nb[f];
          break;
        }
      }
      if (next < 0) return cur;
      cur = next;
    }
    // fallback: linear scan
    for (int i = (int)tets.size() - 1; i >= 0; i--) {
      if (!tets[i].alive) continue;
      bool in = true;
      for (int f = 0; f < 4 && in; f++)
        if (!positively(tets[i], p, f, eps)) in = false;
      if (in) return i;
    }
    return -1;
  }

  bool in_sphere(const Tet &t, const V3 &p) const {
    const V3 &a = pts[t.v[0]];
    const V3 &b = pts[t.v[1]];
    const V3 &c = pts[t.v[2]];
    const V3 &d = pts[t.v[3]];
    double o = orient3d(a, b, c, d);
    double s = insphere(a, b, c, d, p);
    return (o > 0) ? (s > 0) : (s < 0);
  }

  void build(const double *xyz, int n, uint64_t seed) {
    n_input = n;
    pts.resize(n + 4);
    double lo[3] = {1e300, 1e300, 1e300}, hi[3] = {-1e300, -1e300, -1e300};
    for (int i = 0; i < n; i++) {
      pts[i] = {xyz[3 * i], xyz[3 * i + 1], xyz[3 * i + 2]};
      lo[0] = std::min(lo[0], pts[i].x);
      hi[0] = std::max(hi[0], pts[i].x);
      lo[1] = std::min(lo[1], pts[i].y);
      hi[1] = std::max(hi[1], pts[i].y);
      lo[2] = std::min(lo[2], pts[i].z);
      hi[2] = std::max(hi[2], pts[i].z);
    }
    double cx = (lo[0] + hi[0]) / 2, cy = (lo[1] + hi[1]) / 2,
           cz = (lo[2] + hi[2]) / 2;
    double R = 4.0 * std::max({hi[0] - lo[0], hi[1] - lo[1], hi[2] - lo[2],
                               1.0});
    // big tetrahedron containing everything
    pts[n + 0] = {cx - 2 * R, cy - R, cz - R};
    pts[n + 1] = {cx + 2 * R, cy - R, cz - R};
    pts[n + 2] = {cx, cy + 2 * R, cz - R};
    pts[n + 3] = {cx, cy, cz + 2 * R};
    Tet t0;
    t0.v[0] = n;
    t0.v[1] = n + 1;
    t0.v[2] = n + 2;
    t0.v[3] = n + 3;
    if (orient3d(pts[t0.v[0]], pts[t0.v[1]], pts[t0.v[2]], pts[t0.v[3]]) < 0)
      std::swap(t0.v[0], t0.v[1]);
    t0.nb[0] = t0.nb[1] = t0.nb[2] = t0.nb[3] = -1;
    tets.push_back(t0);

    std::vector<int> order(n);
    for (int i = 0; i < n; i++) order[i] = i;
    std::mt19937_64 rng(seed);
    std::shuffle(order.begin(), order.end(), rng);

    double diag = std::sqrt((hi[0] - lo[0]) * (hi[0] - lo[0]) +
                            (hi[1] - lo[1]) * (hi[1] - lo[1]) +
                            (hi[2] - lo[2]) * (hi[2] - lo[2]));
    double eps = 1e-12 * std::max(diag, 1.0);
    // symbolic-perturbation substitute: deterministic sub-epsilon jitter on
    // every input point breaks co-spherical/co-planar degeneracies (exactly
    // regular inputs otherwise flood the Bowyer-Watson cavity)
    std::uniform_real_distribution<double> jall(-1e-7 * diag, 1e-7 * diag);
    for (int i = 0; i < n; i++) {
      pts[i].x += jall(rng);
      pts[i].y += jall(rng);
      pts[i].z += jall(rng);
    }
    std::uniform_real_distribution<double> jit(-eps * 8, eps * 8);

    incident.assign(n, -1);
    int last = 0;
    std::vector<int> cavity, stack;
    std::vector<char> inCav;
    const bool dbg = getenv("D3D_DEBUG") != nullptr;
    for (int oi = 0; oi < n; oi++) {
      if (dbg && oi % 20 == 0)
        fprintf(stderr, "[d3d] insert %d/%d tets=%zu\n", oi, n, tets.size());
      int pi = order[oi];
      V3 p = pts[pi];
      int loc = locate(last, p, eps);
      if (loc < 0) continue;
      // grow cavity: all connected tets whose circumsphere contains p
      cavity.clear();
      stack.clear();
      if ((int)inCav.size() < (int)tets.size())
        inCav.resize(tets.size(), 0);
      stack.push_back(loc);
      inCav[loc] = 1;
      bool degenerate = false;
      while (!stack.empty()) {
        int ti = stack.back();
        stack.pop_back();
        cavity.push_back(ti);
        for (int f = 0; f < 4; f++) {
          int nb = tets[ti].nb[f];
          if (nb < 0 || inCav[nb] || !tets[nb].alive) continue;
          if (in_sphere(tets[nb], p)) {
            inCav[nb] = 1;
            stack.push_back(nb);
          }
        }
      }
      if (degenerate) {
        // jitter and retry once
        pts[pi].x += jit(rng);
        pts[pi].y += jit(rng);
        pts[pi].z += jit(rng);
        for (int ci : cavity) inCav[ci] = 0;
        oi--;
        continue;
      }
      // boundary faces of the cavity -> new tets with apex p
      struct BFace {
        int a, b, c;  // oriented outward from cavity (p on + side after flip)
        int outer;    // neighbor tet outside the cavity (or -1)
        int newTet;
      };
      std::vector<BFace> bfaces;
      for (int ci : cavity) {
        for (int f = 0; f < 4; f++) {
          int nb = tets[ci].nb[f];
          if (nb >= 0 && inCav[nb]) continue;
          BFace bf;
          bf.a = tets[ci].v[kFace[f][0]];
          bf.b = tets[ci].v[kFace[f][1]];
          bf.c = tets[ci].v[kFace[f][2]];
          bf.outer = nb;
          bfaces.push_back(bf);
        }
      }
      // kill cavity tets
      for (int ci : cavity) {
        tets[ci].alive = false;
        inCav[ci] = 0;
      }
      // create new tets
      for (auto &bf : bfaces) {
        Tet nt;
        // face (a,b,c) was oriented with the cavity tet's 4th vertex on
        // the + side; p replaces it on the SAME side (p was inside)
        nt.v[0] = bf.a;
        nt.v[1] = bf.b;
        nt.v[2] = bf.c;
        nt.v[3] = pi;
        if (orient3d(pts[nt.v[0]], pts[nt.v[1]], pts[nt.v[2]],
                     pts[nt.v[3]]) < 0)
          std::swap(nt.v[0], nt.v[1]);
        nt.nb[0] = nt.nb[1] = nt.nb[2] = nt.nb[3] = -1;
        bf.newTet = (int)tets.size();
        tets.push_back(nt);
        if ((int)inCav.size() < (int)tets.size()) inCav.resize(tets.size(), 0);
      }
      // wire neighbors: new<->outer and new<->new via shared faces
      std::unordered_map<uint64_t, std::pair<int, int>> faceMap;
      auto fkey = [](int x, int y) {
        if (x > y) std::swap(x, y);
        return ((uint64_t)x << 32) | (uint32_t)y;
      };
      for (auto &bf : bfaces) {
        Tet &nt = tets[bf.newTet];
        // face opposite p (=v[3]... find index of pi)
        int pIdx = 0;
        for (int i = 0; i < 4; i++)
          if (nt.v[i] == pi) pIdx = i;
        nt.nb[pIdx] = bf.outer;
        if (bf.outer >= 0) {
          Tet &ot = tets[bf.outer];
          for (int f = 0; f < 4; f++) {
            // outer's face not containing its old cavity neighbor:
            // match by vertex set {a,b,c}
            int fa = ot.v[kFace[f][0]], fb = ot.v[kFace[f][1]],
                fc = ot.v[kFace[f][2]];
            int match = (fa == bf.a || fa == bf.b || fa == bf.c) +
                        (fb == bf.a || fb == bf.b || fb == bf.c) +
                        (fc == bf.a || fc == bf.b || fc == bf.c);
            if (match == 3) {
              ot.nb[f] = bf.newTet;
              break;
            }
          }
        }
        // side faces (contain p): pair up via edge map
        for (int f = 0; f < 4; f++) {
          if (f == pIdx) continue;
          // the face opposite v[f] contains p and 2 of {a,b,c}; key = the
          // 2 non-p vertices
          int w[3] = {nt.v[kFace[f][0]], nt.v[kFace[f][1]],
                      nt.v[kFace[f][2]]};
          int e[2], k = 0;
          for (int j = 0; j < 3; j++)
            if (w[j] != pi) e[k++] = w[j];
          uint64_t key = fkey(e[0], e[1]);
          auto it = faceMap.find(key);
          if (it == faceMap.end()) {
            faceMap[key] = {bf.newTet, f};
          } else {
            tets[bf.newTet].nb[f] = it->second.first;
            tets[it->second.first].nb[it->second.second] = bf.newTet;
            faceMap.erase(it);
          }
        }
      }
      if (!bfaces.empty()) {
        last = bfaces.back().newTet;
        incident[pi] = last;
      }
    }
    // repair incidents invalidated by later insertions
    for (int i = 0; i < n; i++)
      if (incident[i] >= 0 && !tets[incident[i]].alive) incident[i] = -1;
    int anyAlive = -1;
    for (int t = (int)tets.size() - 1; t >= 0 && anyAlive < 0; t--)
      if (tets[t].alive) anyAlive = t;
    for (int i = 0; i < n; i++)
      if (incident[i] < 0 && anyAlive >= 0)
        incident[i] = locate(anyAlive, pts[i], 0.0);
  }
};

// ---------------------------------------------------------------- maxflow
struct MaxFlow {
  struct Edge {
    int to;
    double cap;
    int rev;
  };
  std::vector<std::vector<Edge>> g;
  std::vector<int> level, iter;

  explicit MaxFlow(int n) : g(n), level(n), iter(n) {}

  void add_edge(int a, int b, double cab, double cba = 0.0) {
    g[a].push_back({b, cab, (int)g[b].size()});
    g[b].push_back({a, cba, (int)g[a].size() - 1});
  }

  bool bfs(int s, int t) {
    std::fill(level.begin(), level.end(), -1);
    std::queue<int> q;
    level[s] = 0;
    q.push(s);
    while (!q.empty()) {
      int v = q.front();
      q.pop();
      for (auto &e : g[v])
        if (e.cap > 1e-12 && level[e.to] < 0) {
          level[e.to] = level[v] + 1;
          q.push(e.to);
        }
    }
    return level[t] >= 0;
  }

  double dfs(int v, int t, double f) {
    if (v == t) return f;
    for (int &i = iter[v]; i < (int)g[v].size(); i++) {
      Edge &e = g[v][i];
      if (e.cap > 1e-12 && level[v] < level[e.to]) {
        double d = dfs(e.to, t, std::min(f, e.cap));
        if (d > 0) {
          e.cap -= d;
          g[e.to][e.rev].cap += d;
          return d;
        }
      }
    }
    return 0;
  }

  void run(int s, int t) {
    while (bfs(s, t)) {
      std::fill(iter.begin(), iter.end(), 0);
      while (dfs(s, t, 1e300) > 0) {
      }
    }
  }

  // after run: reachable-from-s set = SOURCE side
  void min_cut(int s, std::vector<char> &side) {
    std::fill(side.begin(), side.end(), 0);
    std::queue<int> q;
    side[s] = 1;
    q.push(s);
    while (!q.empty()) {
      int v = q.front();
      q.pop();
      for (auto &e : g[v])
        if (e.cap > 1e-12 && !side[e.to]) {
          side[e.to] = 1;
          q.push(e.to);
        }
    }
  }
};

// segment-triangle intersection (proper crossing, with tolerance)
static bool seg_hits_tri(const V3 &p, const V3 &q, const V3 &a, const V3 &b,
                         const V3 &c) {
  double s1 = orient3d(a, b, c, p);
  double s2 = orient3d(a, b, c, q);
  if ((s1 > 0) == (s2 > 0)) return false;
  double t1 = orient3d(p, q, a, b);
  double t2 = orient3d(p, q, b, c);
  double t3 = orient3d(p, q, c, a);
  return ((t1 >= 0 && t2 >= 0 && t3 >= 0) ||
          (t1 <= 0 && t2 <= 0 && t3 <= 0));
}

}  // namespace

extern "C" {

// Returns 0 on success. Outputs are malloc'd; free with d3d_free.
//   xyz            [n*3] fused points
//   vis_values     [nv] camera indices (CSR values)
//   vis_offsets    [n+1] CSR offsets into vis_values
//   cams           [m*3] camera centers
//   alpha_vis      free-space weight per crossing (OpenMVS-ish, e.g. 1.0)
//   inside_w       t-link weight behind each point (e.g. 2.0)
//   min_component  drop surface components with fewer triangles
//   out_tris       -> malloc'd int32 [n_tris*3] vertex indices into xyz
int d3d_reconstruct_mesh(const double *xyz, int n,
                         const int32_t *vis_values,
                         const int64_t *vis_offsets,
                         const double *cams, int n_cams,
                         double alpha_vis, double inside_w,
                         int min_component,
                         int32_t **out_tris, int64_t *out_n_tris) {
  *out_tris = nullptr;
  *out_n_tris = 0;
  if (getenv("D3D_DEBUG")) fprintf(stderr, "[d3d] enter n=%d\n", n);
  if (n < 5) return 1;

  const bool dbg = getenv("D3D_DEBUG") != nullptr;
  Delaunay dt;
  dt.build(xyz, n, 1234567);
  if (dbg) fprintf(stderr, "[d3d] build done: %zu tets\n", dt.tets.size());

  // compact alive tets
  std::vector<int> remap(dt.tets.size(), -1);
  std::vector<int> alive;
  for (int i = 0; i < (int)dt.tets.size(); i++)
    if (dt.tets[i].alive) {
      remap[i] = (int)alive.size();
      alive.push_back(i);
    }
  int nt = (int)alive.size();
  if (nt == 0) return 2;

  // graph: node per tet + source (nt) + sink (nt+1). OUTSIDE = source side.
  // A tet touching a super vertex is outside (strong source link).
  MaxFlow mf(nt + 2);
  int S = nt, T = nt + 1;
  std::vector<double> srcW(nt, 0.0), snkW(nt, 0.0);

  for (int i = 0; i < nt; i++) {
    const Tet &t = dt.tets[alive[i]];
    bool outer = false;
    for (int k = 0; k < 4; k++)
      if (t.v[k] >= n) outer = true;
    if (outer) srcW[i] += 16.0 * alpha_vis + 1.0;
    for (int f = 0; f < 4; f++) {
      int nb = t.nb[f];
      if (nb >= 0 && remap[nb] > i)  // one edge per face pair
        mf.add_edge(i, remap[nb], alpha_vis * 0.5, alpha_vis * 0.5);
    }
  }

  if (dbg) fprintf(stderr, "[d3d] graph faces wired\n");
  // visibility rays: walk cam -> point, vote free space on crossed tets;
  // vote inside on the tet just past the point (along the ray direction)
  for (int pi = 0; pi < n; pi++) {
    V3 p = dt.pts[pi];
    for (int64_t k = vis_offsets[pi]; k < vis_offsets[pi + 1]; k++) {
      int ci = vis_values[k];
      if (ci < 0 || ci >= n_cams) continue;
      V3 cam = {cams[3 * ci], cams[3 * ci + 1], cams[3 * ci + 2]};
      int cur = dt.incident[pi];
      if (cur < 0) continue;
      // walk from p toward cam crossing faces that the segment hits
      V3 dir = sub(cam, p);
      int guard = 0;
      int prev = -1;
      bool first = true;
      while (cur >= 0 && guard++ < 512) {
        const Tet &t = dt.tets[cur];
        if (!t.alive) break;
        if (!first && remap[cur] >= 0) srcW[remap[cur]] += alpha_vis;
        first = false;
        // does this tet contain the camera? then stop
        bool containsCam = true;
        for (int f = 0; f < 4 && containsCam; f++) {
          const V3 &a = dt.pts[t.v[kFace[f][0]]];
          const V3 &b = dt.pts[t.v[kFace[f][1]]];
          const V3 &c = dt.pts[t.v[kFace[f][2]]];
          if (orient3d(a, b, c, cam) < 0) containsCam = false;
        }
        if (containsCam) break;
        int next = -1;
        for (int f = 0; f < 4; f++) {
          if (t.nb[f] == prev) continue;
          const V3 &a = dt.pts[t.v[kFace[f][0]]];
          const V3 &b = dt.pts[t.v[kFace[f][1]]];
          const V3 &c = dt.pts[t.v[kFace[f][2]]];
          if (seg_hits_tri(p, cam, a, b, c)) {
            next = t.nb[f];
            break;
          }
        }
        prev = cur;
        cur = next;
      }
      // inside vote: the tet behind p (opposite direction from cam)
      V3 behind = {p.x - 0.01 * dir.x, p.y - 0.01 * dir.y,
                   p.z - 0.01 * dir.z};
      int bt = dt.locate(dt.incident[pi], behind, 0.0);
      if (bt >= 0 && remap[bt] >= 0) snkW[remap[bt]] += inside_w;
    }
  }

  if (dbg) fprintf(stderr, "[d3d] rays done\n");
  for (int i = 0; i < nt; i++) {
    if (srcW[i] > 0) mf.add_edge(S, i, srcW[i]);
    if (snkW[i] > 0) mf.add_edge(i, T, snkW[i]);
  }
  mf.run(S, T);
  std::vector<char> outside(nt + 2, 0);
  mf.min_cut(S, outside);
  if (getenv("D3D_DEBUG")) {
    double sw = 0, kw = 0;
    int nout = 0, nsrc = 0, nsnk = 0;
    for (int i = 0; i < nt; i++) {
      sw += srcW[i];
      kw += snkW[i];
      if (srcW[i] > 0) nsrc++;
      if (snkW[i] > 0) nsnk++;
      if (outside[i]) nout++;
    }
    fprintf(stderr,
            "[d3d] nt=%d srcW=%.1f(%d tets) snkW=%.1f(%d tets) outside=%d\n",
            nt, sw, nsrc, kw, nsnk, nout);
  }

  // surface = faces between outside and inside tets (or inside against a
  // missing neighbor), oriented toward the outside cell
  std::vector<int32_t> tris;
  for (int i = 0; i < nt; i++) {
    const Tet &t = dt.tets[alive[i]];
    bool iOut = outside[i];
    for (int f = 0; f < 4; f++) {
      int nb = t.nb[f];
      bool nOut = true;  // no neighbor == outside world
      int nbr = -1;
      if (nb >= 0) {
        nbr = remap[nb];
        nOut = nbr < 0 ? true : (bool)outside[nbr];
      }
      if (iOut || !nOut) continue;  // emit from the INSIDE cell only
      int a = t.v[kFace[f][0]], b = t.v[kFace[f][1]], c = t.v[kFace[f][2]];
      if (a >= n || b >= n || c >= n) continue;  // super-vertex face
      // kFace orientation: v[f] (inside cell apex) on + side; flip so the
      // normal points OUT of the inside cell
      tris.push_back(a);
      tris.push_back(c);
      tris.push_back(b);
    }
  }

  // spurious-component removal on the triangle adjacency (shared edges)
  int ntri = (int)tris.size() / 3;
  if (min_component > 1 && ntri > 0) {
    std::unordered_map<uint64_t, std::vector<int>> edges;
    auto ekey = [](int x, int y) {
      if (x > y) std::swap(x, y);
      return ((uint64_t)x << 32) | (uint32_t)y;
    };
    for (int i = 0; i < ntri; i++)
      for (int e = 0; e < 3; e++)
        edges[ekey(tris[3 * i + e], tris[3 * i + (e + 1) % 3])].push_back(i);
    std::vector<int> comp(ntri, -1);
    int nc = 0;
    for (int i = 0; i < ntri; i++) {
      if (comp[i] >= 0) continue;
      std::vector<int> st{i};
      comp[i] = nc;
      int size = 0;
      std::vector<int> members;
      while (!st.empty()) {
        int t = st.back();
        st.pop_back();
        members.push_back(t);
        size++;
        for (int e = 0; e < 3; e++)
          for (int o : edges[ekey(tris[3 * t + e], tris[3 * t + (e + 1) % 3])])
            if (comp[o] < 0) {
              comp[o] = nc;
              st.push_back(o);
            }
      }
      if (size < min_component)
        for (int m : members) comp[m] = -2;  // mark dropped
      nc++;
    }
    std::vector<int32_t> kept;
    for (int i = 0; i < ntri; i++)
      if (comp[i] != -2) {
        kept.push_back(tris[3 * i]);
        kept.push_back(tris[3 * i + 1]);
        kept.push_back(tris[3 * i + 2]);
      }
    tris.swap(kept);
    ntri = (int)tris.size() / 3;
  }

  *out_n_tris = ntri;
  if (ntri > 0) {
    *out_tris = (int32_t *)malloc(sizeof(int32_t) * tris.size());
    memcpy(*out_tris, tris.data(), sizeof(int32_t) * tris.size());
  }
  return 0;
}

void d3d_free(void *p) { free(p); }

}  // extern "C"
